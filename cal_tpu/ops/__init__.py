from cal_tpu.ops.segment import segment_sum, segment_max, segment_softmax
from cal_tpu.ops.gcn import gcn_aggregate, gcn_aggregate_dense, gcn_aggregate_sparse
from cal_tpu.ops.gat import gat_aggregate_dense, gat_aggregate_sparse
from cal_tpu.ops.gin import gin_aggregate
