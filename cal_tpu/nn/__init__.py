from cal_tpu.nn.layers import (
    MaskedBatchNorm,
    TorchLinear,
    GlorotLinear,
    GCNConvLayer,
    GATConvLayer,
    GINConvLayer,
    ReadoutMLP,
)
