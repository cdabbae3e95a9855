"""Synthetic-dataset entry point — reference main_syn.py.

    python main_syn.py --bias 0.9 --lr 0.002 --min_lr 5e-6 --model CausalGCN
"""
import os

from cal_tpu.data.synthetic import (
    dataset_bias_split,
    generate_synthetic_dataset,
    print_dataset_info,
)
from cal_tpu.train.baseline import train_baseline_syn
from cal_tpu.train.causal import evaluate_causal, train_causal_syn
from cal_tpu.utils.config import parse_args


def main():
    cfg = parse_args()
    os.makedirs(cfg.data_root, exist_ok=True)
    dataset = generate_synthetic_dataset(
        data_num=cfg.data_num,
        node_num=cfg.node_num,
        max_degree=cfg.max_degree,
        noise=cfg.noise,
        shape_num=cfg.shape_num,
        seed=cfg.seed,
        feature_dim=cfg.feature_dim,
        cache_path=os.path.join(
            cfg.data_root,
            "syn_dataset_n{}_nn{}_md{}_noise{}_s{}{}.pkl".format(
                cfg.data_num, cfg.node_num, cfg.max_degree, cfg.noise,
                cfg.seed,
                "" if cfg.feature_dim == -1 else f"_fd{cfg.feature_dim}",
            ),
        ),
    )
    train_set, val_set, test_set, the = dataset_bias_split(
        dataset, bias=cfg.bias, split=(7, 1, 2), total=cfg.data_num * 4,
        num_classes=cfg.num_classes, seed=cfg.seed,
    )
    print(f"train/val/test = {len(train_set)}/{len(val_set)}/{len(test_set)}")
    print_dataset_info(train_set, val_set, test_set, the)
    if cfg.model in ("GCN", "GIN", "GAT"):
        train_baseline_syn(train_set, val_set, test_set, cfg)
    elif cfg.model in ("CausalGCN", "CausalGIN", "CausalGAT"):
        if cfg.inference:
            # serving mode: restore --save_dir checkpoint, eval-only
            evaluate_causal(test_set, cfg)
        else:
            train_causal_syn(train_set, val_set, test_set, cfg)
    else:
        raise ValueError(cfg.model)


if __name__ == "__main__":
    main()
