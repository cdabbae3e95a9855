"""Real-data entry point — reference main_real.py (TU datasets), extended
with OGB graph-property datasets (new scale-out scope, SURVEY.md §7 step 9).

    python main_real.py --model CausalGAT --dataset MUTAG
    python main_real.py --model CausalGAT --dataset ogbg-molhiv --layout sparse

TU datasets run the reference's 10-fold "test_max" protocol; OGB datasets
use their official train/valid/test split with best-val selection.
"""
import numpy as np

from cal_tpu.data.datasets import create_n_filter_triples, get_dataset
from cal_tpu.train.causal import train_causal_real, train_causal_syn
from cal_tpu.utils.config import parse_args


def main():
    cfg = parse_args()
    if cfg.dataset.replace("_", "-").startswith("ogbg-"):
        from cal_tpu.data.ogb import get_ogb_dataset

        graphs, split = get_ogb_dataset(cfg.dataset, root=cfg.data_root,
                                        symmetrize=False)
        num_classes = int(max(g.y for g in graphs)) + 1
        # train_causal_syn sizes the readouts from cfg.num_classes — use the
        # dataset's class count, not the synthetic default of 4
        cfg = cfg.replace(num_classes=num_classes)
        print(f"{cfg.dataset}: {len(graphs)} graphs, "
              f"{graphs[0].x.shape[1]} features, {num_classes} classes")
        train = [graphs[i] for i in split["train"]]
        val = [graphs[i] for i in split["valid"]]
        test = [graphs[i] for i in split["test"]]
        out = train_causal_syn(train, val, test, cfg)
        print(f"sydall: {cfg.dataset} val:[{100 * out['best_val_acc']:.2f}] "
              f"test:[co:{100 * out['test_acc_co']:.2f},"
              f"c:{100 * out['test_acc_c']:.2f},"
              f"o:{100 * out['test_acc_o']:.2f}] at epoch:[{out['epoch']}]")
        if num_classes == 2:
            # the official OGB metric for binary molhiv-style tasks is
            # ROC-AUC (accuracy is meaningless at ~3.5% positives)
            from cal_tpu.models.factory import get_model
            from cal_tpu.train.causal import _make_mesh_and_loaders, predict_causal
            from cal_tpu.utils.metrics import roc_auc_score

            model = get_model(cfg, 0, num_classes)
            mesh, (val_loader, test_loader) = _make_mesh_and_loaders(
                cfg, [val, test], graphs, shuffle_first=False)
            for split_name, loader in (("valid", val_loader),
                                       ("test", test_loader)):
                y, c_logs, o_logs, co_logs = predict_causal(
                    model, out["state"], loader, cfg.eval_random, mesh=mesh)
                auc_o = roc_auc_score(y, o_logs[:, 1])
                auc_co = roc_auc_score(y, co_logs[:, 1])
                # c-branch AUC ~= 50 is the evidence that the KL-to-uniform
                # objective collapsed the shortcut branch (its argmax
                # accuracy is meaningless at molhiv-style class imbalance)
                auc_c = roc_auc_score(y, c_logs[:, 1])
                print(f"sydall: {cfg.dataset} {split_name} "
                      f"ROC-AUC o:[{100 * auc_o:.2f}] "
                      f"co:[{100 * auc_co:.2f}] "
                      f"c:[{100 * auc_c:.2f}] (collapse target 50)")
        return
    triples = create_n_filter_triples([cfg.dataset])
    for dataset_name, feat_str, _net in triples:
        dataset = get_dataset(dataset_name, feat_str=feat_str, root=cfg.data_root)
        print(f"{dataset}: {dataset.num_features} features, "
              f"{dataset.num_classes} classes")
        train_causal_real(dataset, dataset.num_classes, cfg)


if __name__ == "__main__":
    main()
