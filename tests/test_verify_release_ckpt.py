"""scripts/verify_release_ckpt.py — the one-command released-checkpoint
check (VERDICT r4 next-step #7). The real download stays blocked (zero
egress), so the self-test path proves the full flow against a locally-built
``.pyth``: tiny AudioSlowFast -> flax_to_torch_state -> torch.save ->
converter -> two predict runs -> argmax stability + exact logit snapshot."""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)


@pytest.mark.slow
def test_self_test_roundtrip(tmp_path):
    import verify_release_ckpt as v

    snap = v.self_test(str(tmp_path))
    assert snap["stable_across_runs"] is True
    assert set(snap["heads"]) == {"verb", "noun"}
    assert snap["heads"]["verb"]["shape"][-1] == 6


def test_fetch_local_path_and_missing(tmp_path):
    import verify_release_ckpt as v

    p = tmp_path / "x.pyth"
    p.write_bytes(b"stub")
    assert v.fetch(str(p)) == str(p)
    with pytest.raises(SystemExit) as ei:
        v.fetch(str(tmp_path / "absent.pyth"))
    assert ei.value.code == 2


def test_release_cfg_geometry():
    """The release mapping matches the reference's published heads
    (EPIC: 97 verbs / 300 nouns; VGG-Sound: 309 classes)."""
    import verify_release_ckpt as v

    assert v.build_cfg("slowfast", "epic").MODEL.NUM_CLASSES == [97, 300]
    assert v.build_cfg("slow", "vgg").MODEL.NUM_CLASSES == [309]
    assert v.build_cfg("fast", "epic").MODEL.MODEL_NAME == "ResNet"
    assert v.build_cfg("slowfast", "vgg").MODEL.ARCH == "slowfast"
