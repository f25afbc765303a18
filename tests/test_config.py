"""Config-system tests: parse the reference's own YAML files unchanged."""
import os

import pytest

from asva_tpu.config import AnimationJobConfig, SyncJobConfig

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_parse_reference_animation_yaml():
    cfg = AnimationJobConfig.from_yaml(
        f"{REF}/configs/audio-cond_animation/avsync15_audio-cond_cfg.yaml")
    assert cfg.schedule.beta_start == 0.00085
    assert cfg.schedule.beta_end == 0.012
    assert cfg.schedule.prediction_type == "epsilon"
    assert cfg.n_segment == 12
    assert cfg.audio_cond_drop_prob == 0.2
    assert cfg.unet.down_block_types[0] == \
        "FFSpatioAudioTempCrossAttnDownBlock3D"
    assert cfg.unet.up_block_types[0] == "FFSpatioTempResUpBlock3D"
    assert cfg.unet.remat is True
    assert cfg.optim.max_train_steps == 600000
    assert cfg.optim.checkpointing_milestones == 37000
    assert cfg.optim.gradient_accumulation_steps == 2
    assert cfg.dataset.video_num_frame == 12
    assert tuple(cfg.dataset.img_size) == (256, 256)


REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_in_tree_configs_match_reference_names():
    """A reference user's run commands must work verbatim: every reference
    config filename exists in-tree and parses to the same hyperparams.
    Deliberate platform divergences only: output_dir label, wandb off by
    default, bf16 instead of fp16 (the TPU-native mixed precision)."""
    import dataclasses

    def diffs(a, b, prefix=""):
        out = []
        for f in dataclasses.fields(a):
            va, vb = getattr(a, f.name), getattr(b, f.name)
            if dataclasses.is_dataclass(va):
                out += diffs(va, vb, prefix + f.name + ".")
            elif va != vb:
                out.append(prefix + f.name)
        return out

    allowed = {"output_dir", "log_with", "optim.mixed_precision"}
    for rel in ("configs/audio-cond_animation/avsync15_audio-cond_cfg.yaml",
                "configs/audio-cond_animation/landscapes_audio-cond_cfg.yaml",
                "configs/audio-cond_animation/"
                "thegreatesthits_audio-cond_cfg.yaml"):
        ours = AnimationJobConfig.from_yaml(os.path.join(REPO, rel))
        theirs = AnimationJobConfig.from_yaml(os.path.join(REF, rel))
        assert set(diffs(ours, theirs)) <= allowed, (rel, diffs(ours, theirs))
    rel = "configs/avsync/vggss_sync_contrast.yaml"
    ours = SyncJobConfig.from_yaml(os.path.join(REPO, rel))
    theirs = SyncJobConfig.from_yaml(os.path.join(REF, rel))
    assert set(diffs(ours, theirs)) <= allowed, diffs(ours, theirs)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_parse_reference_sync_yaml():
    cfg = SyncJobConfig.from_yaml(
        f"{REF}/configs/avsync/vggss_sync_contrast.yaml")
    assert cfg.tau == 0.1
    assert cfg.train_dataset.num_clips == 21
    assert cfg.train_dataset.shift_time == 0.2
    assert cfg.train_dataset.sampling_type == "random-compact"
    assert cfg.test_dataset.sampling_type == "uniform"
    assert cfg.optim.max_train_steps == 350000
    assert cfg.optim.learning_rate == 2e-4
    assert cfg.test_steps == 2500


def test_default_configs_standalone():
    a = AnimationJobConfig()
    assert a.unet.block_out_channels == (320, 640, 1280, 1280)
    s = SyncJobConfig()
    assert s.optim.learning_rate == 2e-4
