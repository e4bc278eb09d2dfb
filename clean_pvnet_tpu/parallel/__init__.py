from clean_pvnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from clean_pvnet_tpu.parallel.distributed import (  # noqa: F401
    DistributedSession,
    init_distributed,
)
from clean_pvnet_tpu.parallel.refine_sharded import (  # noqa: F401
    make_sharded_refiner,
    refine_instances,
)
from clean_pvnet_tpu.parallel.voting_sharded import (  # noqa: F401
    make_sharded_vote,
)
