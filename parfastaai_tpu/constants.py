"""Global constants of the ParFastAAI-TPU engine.

The tetramer universe is the set of length-4 amino-acid substrings over the
20-letter alphabet, encoded as integers in ``[0, 20**4)`` (reference:
include/pfaai/interface.hpp:233, NTETRAMERS = 160000).
"""

# Number of possible amino-acid tetramers (20**4).
NTETRAMERS: int = 160000

# Default CSV field separator (reference: src/main.cpp:74, default ",").
DEFAULT_SEPARATOR: str = ","

# Lane width of the TPU vector unit; presence matrices are padded so the
# compacted tetramer axis is a multiple of this (MXU tile = 128x128).
LANE: int = 128

# Default tile edge for the genome-pair tile grid (MXU-friendly).
DEFAULT_TILE: int = 128

# Widest contraction axis a single VMEM input block holds (int8 bytes per
# (1, 8, K) sublane row budget); beyond it the K-blocked kernel families
# take over (ops/pallas_intersect).
MAX_K_SINGLE_BLOCK: int = 32768

# HOST-side padding granularity for wide presence buckets.  Buckets wider
# than MAX_K_SINGLE_BLOCK are padded to a K_BLOCK multiple host-side
# (etl.database.bucket_bounds), so the kernels' in-jit _pad_k is a no-op —
# a device-side pad of a multi-GB operand materializes a full HLO-temp
# copy, which OOMed HBM on exactly the >HBM staged workloads it serves.
K_BLOCK: int = 4096

# Contraction-axis block width of the K-blocked KERNEL grids (divides
# K_BLOCK, so host padding stays valid).  Measured on the bench chip
# (2026-08-21, P=16 A=B=1024 K=51200 tile=512, salted-chain protocol):
# 4096-wide blocks (2.1 MB each) ran at 0.40 MFU — per-step time ~ serial
# DMA + MXU, i.e. the double buffering of the two input blocks no longer
# overlapped; halving to 2048 (1 MB blocks) restored the overlap at
# 0.804 MFU (2.0x), while 1024 dropped back to 0.68 (per-step overhead
# exposure).  2048 is the measured optimum of this sweep.
KERNEL_K_BLOCK: int = 2048
