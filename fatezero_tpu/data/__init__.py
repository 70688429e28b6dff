from fatezero_tpu.data.dataset import ImageSequenceDataset  # noqa: F401
