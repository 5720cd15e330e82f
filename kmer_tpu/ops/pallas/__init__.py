"""Pallas TPU kernels: VMEM-resident bitonic sort and MXU one-hot
histogram (see sort.py / histogram.py for design notes)."""

from .histogram import dense_histogram_mxu, DENSE_MXU_K_MAX
from .sort import sort_words_pallas

__all__ = ["sort_words_pallas", "dense_histogram_mxu", "DENSE_MXU_K_MAX"]
