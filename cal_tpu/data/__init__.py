from cal_tpu.data.synthetic import (
    generate_synthetic_dataset,
    dataset_bias_split,
    SYN_CLASSES,
)
from cal_tpu.data.loader import Loader, compute_budgets
