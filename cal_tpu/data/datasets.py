"""Dataset assembly — reference ``datasets.py`` + ``opts.create_n_filter_triples``.

Parses the ``feat_str`` mini-grammar (reference datasets.py:16-31) and builds
a :class:`~cal_tpu.data.tu.TUDataset` with a
:class:`~cal_tpu.data.feature_expansion.FeatureExpander` pre-transform.
``edge_attr`` is dropped by construction (reference datasets.py:47 —
HostGraph carries no edge attributes).
"""
from __future__ import annotations

import os
import re
from itertools import product
from typing import List, Optional, Sequence, Tuple

from cal_tpu.data.feature_expansion import FeatureExpander
from cal_tpu.data.tu import TUDataset


def parse_feat_str(feat_str: str) -> dict:
    """Reference regex grammar, bug-for-bug (datasets.py:16-31).

    Notably ``degree`` uses a substring test, so ``odeg10`` also turns the
    scalar degree feature on, and ``re(\\w+)`` greedily matches ``reall``.
    """
    onehot = re.findall(r"odeg(\d+)", feat_str)
    k = re.findall(r"an{0,1}k(\d+)", feat_str)
    groupd = re.findall(r"groupd(\d+)", feat_str)
    remove_edges = re.findall(r"re(\w+)", feat_str)
    noise_add = re.findall(r"randa([\d\.]+)", feat_str)
    noise_del = re.findall(r"randd([\d\.]+)", feat_str)
    return {
        "degree": feat_str.find("deg") >= 0,
        "onehot_maxdeg": int(onehot[0]) if onehot else None,
        "AK": int(k[0]) if k else 0,
        "group_degree": int(groupd[0]) if groupd else 0,
        "remove_edges": remove_edges[0] if remove_edges else "none",
        "edge_noises_add": float(noise_add[0]) if noise_add else 0.0,
        "edge_noises_delete": float(noise_del[0]) if noise_del else 0.0,
        "centrality": feat_str.find("cent") >= 0,
        "coord": feat_str.find("coord") >= 0,
    }


def get_dataset(
    name: str,
    sparse: bool = True,
    feat_str: str = "deg+odeg100",
    root: Optional[str] = None,
    pruning_percent: float = 0.0,
) -> TUDataset:
    """Build a TU dataset with feature expansion (reference datasets.py:11-48).

    ``pruning_percent`` (reference datasets.py:11,45) randomly drops that
    fraction of each graph's undirected edges before feature expansion and
    caches under a separate file — see cal_tpu/data/tu.py for why this is
    an intent-implementation rather than a behavior port (the reference's
    own path crashes)."""
    del sparse  # layout is a loader concern in this framework
    if not root:
        root = os.path.join(os.path.expanduser("~"), "cal_tpu_data")
    f = parse_feat_str(feat_str)
    pre_transform = FeatureExpander(
        degree=f["degree"],
        onehot_maxdeg=f["onehot_maxdeg"],
        AK=f["AK"],
        centrality=f["centrality"],
        remove_edges=f["remove_edges"],
        edge_noises_add=f["edge_noises_add"],
        edge_noises_delete=f["edge_noises_delete"],
        group_degree=f["group_degree"],
    )
    return TUDataset(
        root,
        name,
        pre_transform=pre_transform,
        use_node_attr=True,
        feat_str=feat_str,
        pruning_percent=pruning_percent,
    )


def create_n_filter_triples(
    datasets: Sequence[str],
    feat_strs: Sequence[str] = ("deg+odeg100",),
    nets: Sequence[str] = ("ResGCN",),
    gfn_add_ak3: bool = True,
    gfn_reall: bool = True,
    reddit_odeg10: bool = True,
    dd_odeg10_ak1: bool = True,
) -> List[Tuple[str, str, str]]:
    """Per-dataset feat_str specialization (reference opts.py:121-139)."""
    del gfn_add_ak3, gfn_reall  # reference accepts but never uses these
    triples = [(d, f, n) for d, f, n in product(datasets, feat_strs, nets)]
    out = []
    for dataset, feat_str, net in triples:
        if reddit_odeg10 and dataset in (
            "REDDIT-BINARY", "REDDIT-MULTI-5K", "REDDIT-MULTI-12K",
            "SYNREDDIT",  # no-egress REDDIT-BINARY stand-in
        ):
            feat_str = feat_str.replace("odeg100", "odeg10")
        if dd_odeg10_ak1 and dataset in ("DD", "SYNDD"):
            # SYNDD = no-egress DD stand-in (benchmarks/gen_dd_synthetic)
            feat_str = feat_str.replace("odeg100", "odeg10")
            feat_str = feat_str.replace("ak3", "ak1")
        out.append((dataset, feat_str, net))
    return out
