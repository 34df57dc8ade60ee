"""Shared tile-layout constants — the pack <-> kernel contract.

These values bind the packers (genomax/pack/bucketing.py) to every
kernel family (genomax/kernels/*): the packers size and quantize the
tile and stream buffers with them, and the kernels' dynamic window
loads and slab DMAs assume those bounds. They used to be defined
independently in three modules; tuning one copy (e.g. trying a bigger
DMA slab in one kernel) silently desynchronized pack and kernel and
drove DMA source offsets negative. Import from here — never redefine.

Layout recap (full proofs in kernels/wavefront.py):

- x tiles are (NXs, LANES) sublane-major: sequence position on
  sublanes, LANES independent pairs on lanes.
- stream buffers are (NDs, LANES) with the sequence REVERSED around
  the anchor A = NDs - NXs: sy[k] sits at row A - 1 - k, pads
  (PAD_STREAM) below row A - len. The kernels' per-diagonal window
  load is rows [A - d, A - d + NXs); the packers guarantee
  A >= ceil(n_diags/unroll)*unroll for any unroll <= MAX_UNROLL, and
  quantize A to STREAM_CHUNK so the HBM-streamed kernels'
  chunk-granular slab DMAs stay in bounds for the whole sweep.
"""

LANES = 128  # pairs per tile (VPU lane width)
SUB_Q = 8  # sublane padding quantum
MAX_UNROLL = 32  # largest unroll the packs reserve anchor slack for
STREAM_CHUNK = 256  # diagonals per HBM->VMEM slab DMA (streamed kernels)

# Pad codes. x pads decay the DP state exactly (PAD_X mismatches
# everything, including PAD_STREAM); packers loudly reject bytes 0/1
# inside real sequences.
PAD_X = 1
PAD_STREAM = 0
