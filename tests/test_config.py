import textwrap

from fatezero_tpu.common.config import Config, instantiate_from_config, load_config


def test_basic_access(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        textwrap.dedent(
            """
            pretrained_model_path: ckpt/sd14
            dataset_config:
              n_sample_frame: 8
              sampling_rate: 1
            editing_config:
              clip_length: "${..dataset_config.n_sample_frame}"
              guidance_scale: 7.5
              editing_prompts: [a, b]
            """
        )
    )
    cfg = load_config(str(p))
    assert cfg.dataset_config.n_sample_frame == 8
    # relative interpolation preserves int type
    assert cfg.editing_config.clip_length == 8
    assert isinstance(cfg.editing_config.clip_length, int)
    assert cfg.editing_config.editing_prompts == ["a", "b"]
    d = cfg.to_dict()
    assert d["editing_config"]["clip_length"] == 8


def test_absolute_interpolation():
    cfg = Config({"a": {"b": 3}, "c": "${a.b}", "d": "x${a.b}y"})
    assert cfg.c == 3
    assert cfg.d == "x3y"


def test_p2p_int_keys():
    cfg = Config({"p2p_config": {0: {"self_replace_steps": 0.6}}})
    assert cfg.p2p_config["0"].self_replace_steps == 0.6
    assert "0" in cfg.p2p_config


def test_instantiate_from_config():
    obj = instantiate_from_config(
        {"target": "collections.OrderedDict", "params": {"x": 1}}, y=2
    )
    assert obj == {"x": 1, "y": 2}
