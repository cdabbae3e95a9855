from cal_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_stacked,
)
from cal_tpu.parallel.dp import make_dp_causal_train_step, make_dp_causal_eval_step
from cal_tpu.parallel.intervene import (
    allgather_intervention,
    ppermute_intervention,
)
from cal_tpu.parallel.edge_partition import (
    edge_partitioned_gcn_aggregate,
    edge_partitioned_gat_aggregate,
    halo_exchange,
    partitioned_edge_attention,
    partitioned_gat_aggregate,
    partitioned_gcn_aggregate,
    partitioned_gin_aggregate,
    shard_edges,
)
from cal_tpu.parallel.partition import (
    comms_stats,
    partition_batch,
    partition_budgets,
)
