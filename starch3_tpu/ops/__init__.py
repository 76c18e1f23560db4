"""Device-side (JAX/XLA/Pallas) kernels for the codec's hot stages.

Stage-to-hardware mapping (SURVEY.md §7 step 4; see
/opt/skills/guides/pallas_guide.md for the hardware model):

  - ``bwt_jax``: BWT rotation sort as prefix doubling over XLA sorts —
    O(log n) rounds of fixed-shape multi-key sorts, the TPU-native
    replacement for the reference's sequential blocksort.c.
  - ``mtf_jax``: MTF ranks as a scan-of-cummax over (chunk, 256) tiles on
    the VPU — the parallel reformulation of the inherently sequential
    move-to-front list.
  - ``huff_jax``: Huffman group costing as (groups x alphabet) histogram
    times (alphabet x tables) length matrices on the MXU.
  - ``transform_jax``: the delta transform's numeric core (diffs +
    associative scan) and fixed-width decimal text emission.

All kernels are fixed-shape (padded + masked) so XLA compiles them once
per block geometry; actual lengths travel as scalar operands.
"""
