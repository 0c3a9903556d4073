"""Config system tests (reference layer L1, SURVEY §5.6): JSON round-trip
for every preset (checkpoint fingerprint stability) and validation."""

import pytest

from gan_sass_tf_tpu import config


def test_json_roundtrip_all_presets():
    for name in config.list_configs():
        cfg = config.get_config(name)
        back = config.Config.from_json(cfg.to_json())
        assert back == cfg, name                  # incl. tuple-typed fields
        assert back.fingerprint() == cfg.fingerprint(), name


def test_all_presets_build_datasets_as_shipped():
    """Every preset must run without --set overrides (VERDICT r4 item 8):
    dataset construction is where an unset data_dir used to die."""
    import dataclasses

    from gan_sass_tf_tpu.data import make_dataset

    for name in config.list_configs():
        cfg = config.get_config(name)
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, segment_seconds=0.25),
            train=cfg.train.__class__(**{**cfg.train.__dict__,
                                         "batch_size": 2}))
        batch = make_dataset(cfg, seed=0, split="train").batch()
        assert batch.shape[0] == 2, name


def test_unknown_preset_raises():
    with pytest.raises(KeyError, match="unknown config"):
        config.get_config("no_such_preset")


def test_duplicate_registration_raises():
    with pytest.raises(ValueError, match="duplicate"):
        config.register_config("2src_toy_cpu")(lambda: config.Config())


def test_win_length_validation():
    with pytest.raises(ValueError, match="win_length"):
        config.DSPConfig(n_fft=128, win_length=256)


def test_lr_schedule_validation():
    with pytest.raises(ValueError, match="lr_decay_steps"):
        config.TrainConfig(d_lr_schedule="cosine")
    with pytest.raises(ValueError, match="constant/cosine/linear"):
        config.TrainConfig(g_lr_schedule="exponential", lr_decay_steps=10)
    # valid combinations construct
    config.TrainConfig(d_lr_schedule="cosine", g_lr_schedule="linear",
                       lr_decay_steps=100, lr_end_factor=0.05)


def test_r1_gamma_validation():
    with pytest.raises(ValueError, match="r1_gamma"):
        config.TrainConfig(r1_gamma=-0.1)
