from genomax.pack.bucketing import (  # noqa: F401
    SWPacked,
    PairHMMPacked,
    pack_sw_pairs,
    pack_pairhmm_batches,
)
