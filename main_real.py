"""Real-data (TU) entry point — reference main_real.py.

    python main_real.py --model CausalGAT --dataset MUTAG
"""
from cal_tpu.data.datasets import create_n_filter_triples, get_dataset
from cal_tpu.train.causal import train_causal_real
from cal_tpu.utils.config import parse_args


def main():
    cfg = parse_args()
    triples = create_n_filter_triples([cfg.dataset])
    for dataset_name, feat_str, _net in triples:
        dataset = get_dataset(dataset_name, feat_str=feat_str, root=cfg.data_root)
        print(f"{dataset}: {dataset.num_features} features, "
              f"{dataset.num_classes} classes")
        train_causal_real(dataset, dataset.num_classes, cfg)


if __name__ == "__main__":
    main()
