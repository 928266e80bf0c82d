"""Config-system parity tests (reference surface: fvcore CfgNode)."""

import pytest

from asf_tpu.config import get_cfg


def test_defaults_tree():
    cfg = get_cfg()
    assert cfg.TRAIN.BATCH_SIZE == 64
    assert cfg.AUDIO_DATA.SAMPLING_RATE == 24000
    assert cfg.AUDIO_DATA.NUM_FRAMES == 256
    assert cfg.MODEL.NUM_CLASSES == [400]
    assert cfg.SLOWFAST.ALPHA == 8
    assert cfg.RESNET.NUM_BLOCK_TEMP_KERNEL == [[3], [4], [6], [3]]
    assert cfg.TEST.SLIDE.WIN_SIZE == 1.0


def test_merge_from_list_and_coercion():
    cfg = get_cfg()
    cfg.merge_from_list(
        ["TRAIN.BATCH_SIZE", "16", "MODEL.NUM_CLASSES", "[97, 300]", "AUDIO_DATA.CLIP_SECS", "2"]
    )
    assert cfg.TRAIN.BATCH_SIZE == 16
    assert cfg.MODEL.NUM_CLASSES == [97, 300]
    assert cfg.AUDIO_DATA.CLIP_SECS == 2.0  # int -> float promotion


def test_merge_unknown_key_raises():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["TRAIN.NOT_A_KEY", "1"])


def test_merge_from_reference_yaml(tmp_path):
    """The reference's shipped experiment YAMLs must merge cleanly."""
    import glob

    cfg_files = sorted(glob.glob("/root/reference/models/asf/config/*.yaml")) + sorted(
        glob.glob("/root/reference/models/asf/config/slide/*.yaml")
    )
    # SLOWFAST_R50.local.yaml carries keys absent from the reference's own
    # defaults (MODEL.VOCAB_PDDL_*); it cannot merge under fvcore either.
    cfg_files = [f for f in cfg_files if not f.endswith(".local.yaml")]
    assert cfg_files, "reference config YAMLs not found"
    for f in cfg_files:
        cfg = get_cfg()
        cfg.merge_from_file(f)
    # Spot-check one.
    cfg = get_cfg()
    cfg.merge_from_file("/root/reference/models/asf/config/SLOWFAST_R50.yaml")
    assert cfg.AUDIO_DATA.NUM_FRAMES == 400
    assert cfg.SLOWFAST.ALPHA == 4
    assert cfg.MODEL.MODEL_NAME == "AudioSlowFastGRU"
    assert cfg.RESNET.FREQUENCY_STRIDES == [[1, 1], [2, 2], [2, 2], [2, 2]]


def test_clone_isolation_and_dump():
    cfg = get_cfg()
    c2 = cfg.clone()
    c2.TRAIN.BATCH_SIZE = 1
    assert cfg.TRAIN.BATCH_SIZE == 64
    dumped = cfg.dump()
    assert "BATCH_SIZE" in dumped


def test_launch_job_multihost_init(monkeypatch):
    """NUM_SHARDS>1 initialises the JAX distributed runtime with the
    reference's --init_method tcp://host:port flag semantics."""
    from asf_tpu.config import get_cfg
    from asf_tpu.tools import run_net

    calls = {}

    def fake_init(coordinator_address=None, num_processes=None, process_id=None):
        calls.update(
            addr=coordinator_address, n=num_processes, pid=process_id
        )

    import jax

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    cfg = get_cfg()
    cfg.NUM_SHARDS = 4
    cfg.SHARD_ID = 2
    out = run_net.launch_job(cfg, "tcp://host:1234", lambda c: "ran")
    assert out == "ran"
    assert calls == {"addr": "host:1234", "n": 4, "pid": 2}
