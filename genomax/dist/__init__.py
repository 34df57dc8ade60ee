from genomax.dist.mesh import make_mesh, initialize_distributed  # noqa: F401
from genomax.dist.sharded import (  # noqa: F401
    sw_forward_sharded,
    pairhmm_forward_sharded,
)
