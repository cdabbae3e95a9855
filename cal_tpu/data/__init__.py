from cal_tpu.data.synthetic import (
    generate_synthetic_dataset,
    dataset_bias_split,
    SYN_CLASSES,
)
from cal_tpu.data.loader import Loader, compute_budgets
from cal_tpu.data.datasets import create_n_filter_triples, get_dataset
from cal_tpu.data.feature_expansion import FeatureExpander
from cal_tpu.data.tu import TUDataset, read_tu_data
from cal_tpu.data.kfold import k_fold
