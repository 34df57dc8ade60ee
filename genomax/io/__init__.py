from genomax.io.formats import (  # noqa: F401
    SWPair,
    PairHMMBatch,
    parse_sw_file,
    parse_pairhmm_file,
    write_pairhmm_output,
)
from genomax.io.phred import phred_to_error_prob  # noqa: F401
