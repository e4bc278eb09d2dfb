from clean_pvnet_tpu.ops.voting import (  # noqa: F401
    select_foreground,
    ransac_vote,
    estimate_voting_distribution,
    VoteResult,
)
from clean_pvnet_tpu.ops.nn_query import nearest_neighbor_dists  # noqa: F401
from clean_pvnet_tpu.ops.dcn import (  # noqa: F401
    DCN,
    DCNPooling,
    deform_conv2d,
    deform_psroi_pool,
)
