"""Pallas TPU kernels for the hot ops of the pipeline."""

from .logmel_pallas import PallasLogMel, frame_waveform

__all__ = ["PallasLogMel", "frame_waveform"]
