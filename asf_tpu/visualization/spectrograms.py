"""Render slow/fast spectrograms of a dataset item to PNG.

TPU-native counterpart of the reference's spectrogram dumper
(/root/reference/audio_slowfast/visualization/spectrograms.py:17-87),
without the librosa.display dependency (a plain imshow with the same
value range / orientation). Headless: saves files, never calls plt.show().

Usage:
    python -m asf_tpu.visualization.spectrograms -i 3 --cfg cfg.yaml
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def plot_spectrograms(spectrograms, index: int, prefix: str = "",
                      d_type: str = "regular", output_root: str = "res/dataloader"):
    """spectrograms: [slow, fast] channel-last arrays (T, F, 1) / (N, T, F, 1)."""
    names = ("slow", "fast") if len(spectrograms) == 2 else ("spec",)
    for name, sg in zip(names, spectrograms):
        sg = np.asarray(sg)
        sg = sg[..., 0] if sg.shape[-1] == 1 else sg
        while sg.ndim > 2:  # GRU items: take the first window
            sg = sg[0]
        _plot_spectrogram(sg, index, prefix, name, d_type, output_root)


def _plot_spectrogram(spec: np.ndarray, index: int, prefix: str, s_type: str,
                      d_type: str, output_root: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    output_path = os.path.join(output_root, d_type)
    os.makedirs(output_path, exist_ok=True)

    plt.figure(figsize=(10, 10))
    # (T, F) -> mel bins on y, time on x, low frequencies at the bottom
    plt.imshow(spec.T, vmin=-6, vmax=3, cmap="magma", origin="lower", aspect="auto")
    plt.colorbar(label="dB")
    plt.title(f"Mel spectrogram for sample {index} ({prefix})", fontsize=18)
    plt.xlabel("Time", fontsize=15)
    plt.ylabel("Mel-Frequency bins", fontsize=15)
    out = os.path.join(output_path, f"{s_type}_{index}_{prefix}_{d_type}.png")
    plt.savefig(out)
    plt.close()
    return out


def _item_pathways(cfg, item):
    """Dataset item (host waveform) -> pathway spectrograms via the on-device
    front end — the single source of truth for what the model actually sees."""
    import jax.numpy as jnp

    from asf_tpu.engine.steps import make_input_pipeline

    pipeline = make_input_pipeline(cfg)
    wave = jnp.asarray(item["waveform"])[None]
    n_valid = jnp.asarray(item["n_valid"]).reshape((1, -1) if wave.ndim == 3 else (1,))
    paths = pipeline(wave, n_valid, None, train=False)
    return [np.asarray(p[0]) for p in paths]


def run(index: int, cfg_file: str | None = None) -> None:
    from asf_tpu.config import get_cfg
    from asf_tpu.data.build import build_dataset

    cfg = get_cfg()
    if cfg_file:
        cfg.merge_from_file(cfg_file)

    regular = build_dataset("EpicKitchens", cfg, "train")
    plot_spectrograms(_item_pathways(cfg, regular[index]), index=index, d_type="regular")

    gru = build_dataset("EpicKitchensGRUwithPDDL", cfg, "train")
    plot_spectrograms(_item_pathways(cfg, gru[index]), index=index, d_type="gru")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--index", type=int, required=True)
    parser.add_argument("--cfg", dest="cfg_file", default=None)
    args = parser.parse_args()
    run(index=args.index, cfg_file=args.cfg_file)
