from fatezero_tpu.pipelines.fatezero_pipeline import FateZeroPipeline  # noqa: F401
