"""Small-tool coverage: fix_weights (.pyth key-prefix fixer) and
extract_audio's file discovery (ffmpeg invocation stubbed — hermetic)."""

import os

import numpy as np


def test_fix_weights_roundtrip(tmp_path):
    import torch

    from asf_tpu.tools.fix_weights import fix_state_keys, main

    sd = {
        "s1.stem.conv.weight": torch.randn(4, 1, 1, 7),
        "head.projection.weight": torch.randn(6, 16),
    }
    src = os.path.join(str(tmp_path), "in.pyth")
    mid = os.path.join(str(tmp_path), "prefixed.pyth")
    out = os.path.join(str(tmp_path), "roundtrip.pyth")
    with open(src, "wb") as f:
        torch.save({"model_state": sd, "epoch": 3}, f)

    main([src, mid, "--add-prefix", "model."])
    ck = torch.load(mid, map_location="cpu", weights_only=False)
    assert set(ck["model_state"]) == {"model." + k for k in sd}
    assert ck["epoch"] == 3  # non-state payload preserved

    main([mid, out, "--strip-prefix", "model."])
    ck2 = torch.load(out, map_location="cpu", weights_only=False)
    assert set(ck2["model_state"]) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(ck2["model_state"][k].numpy(), sd[k].numpy())

    # strip is a no-op for keys without the prefix
    assert fix_state_keys({"a.b": 1}, strip_prefix="model.") == {"a.b": 1}


def test_extract_audio_discovers_and_maps_outputs(tmp_path, monkeypatch):
    import asf_tpu.tools.extract_audio as ea

    vids = os.path.join(str(tmp_path), "videos")
    os.makedirs(os.path.join(vids, "P01"))
    for name in ["P01/P01_01.MP4", "P01/P01_02.mp4", "P01/notes.txt"]:
        open(os.path.join(vids, name), "w").write("x")
    out_dir = os.path.join(str(tmp_path), "wav")

    calls = []
    monkeypatch.setattr(
        ea, "ffmpeg_extraction", lambda i, o, sr: calls.append((i, o, sr)) or 0
    )
    ea.main([vids, out_dir, "--sampling_rate", "24000", "--jobs", "2"])

    assert os.path.isdir(out_dir)
    got = sorted(os.path.basename(o) for _i, o, _sr in calls)
    assert got == ["P01_01.wav", "P01_02.wav"]  # .MP4 any case; txt ignored
    assert all(sr == "24000" for _i, _o, sr in calls)
