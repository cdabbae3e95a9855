"""Synthetic OOD dataset: motif shapes on confounded basis graphs.

Behavioral port of the reference generator stack (utils.py:59-89,
gengraph.py:51-79, synthetic_structsim.py, featgen.py:14-31) on host NumPy /
networkx:

* 4 classes = motif shape {house, cycle(6), grid(2x3), diamond};
* confounder = basis context {tree, ba}:
    - ba:   barabasi_albert_graph(width = node_num^2, m = 2)
    - tree: balanced_tree(r = node_num, height = 2)
  (settings_dict, reference utils.py:62-63: tree width_basis=2 is the height,
  m=node_num is the branching factor -> tree(start, 2, r=node_num));
* one motif attached at a random basis node (build_graph,
  synthetic_structsim.py:254-279);
* +noise (default 10%) random extra edges (perturb, gengraph.py:13-33);
* node features = one-hot degree capped at max_degree (featgen.py:21-28);
* biased split (utils.py:123-159): P(tree | house) = bias,
  P(tree | other class) = 1 - bias in train/val; test is 50/50.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Sequence

import networkx as nx
import numpy as np

from cal_tpu.graph import HostGraph

SYN_CLASSES = ["house", "cycle", "grid", "diamond"]
SYN_CONTEXTS = ["tree", "ba"]


# --------------------------------------------------------------------------
# motif constructors (synthetic_structsim.py:12-204) as edge lists
#
# The full shape library, parameterized like the reference's constructors.
# A spec is either a plain name (CAL's four classes use the defaults below)
# or a tuple mirroring the reference's ["name", *args] shape lists:
#   ("cycle", n)           cycle of length n        (synthetic_structsim.py:49)
#   ("clique", n[, rm])    K_n, rm random edges cut (synthetic_structsim.py:12)
#   ("tree", height, r)    balanced r-ary tree      (synthetic_structsim.py:73)
#   ("ba", width, m)       BA graph as a motif      (synthetic_structsim.py:91)
#   ("grid", (rows, cols)) 2-D lattice              (synthetic_structsim.py:198)
# --------------------------------------------------------------------------

MotifSpec = "str | tuple"


def _grid_edges(rows: int, cols: int) -> tuple[int, list[tuple[int, int]]]:
    edges = []
    for r in range(rows):
        for c in range(cols):
            if c + 1 < cols:
                edges.append((r * cols + c, r * cols + c + 1))
            if r + 1 < rows:
                edges.append((r * cols + c, (r + 1) * cols + c))
    return rows * cols, edges


def _motif_edges(
    shape, rng: np.random.Generator | None = None
) -> tuple[int, list[tuple[int, int]]]:
    name, args = (shape, ()) if isinstance(shape, str) else (shape[0], tuple(shape[1:]))
    if name == "house":
        # 4-cycle + roof node connected to nodes 0,1 (synthetic_structsim.py:169-195)
        return 5, [(0, 1), (1, 2), (2, 3), (3, 0), (4, 0), (4, 1)]
    if name == "cycle":
        # default 6 (gengraph.py:62 uses ["cycle", 6])
        n = args[0] if args else 6
        return n, [(i, (i + 1) % n) for i in range(n)]
    if name == "diamond":
        # 6-cycle + chords (5,1) and (4,2) (synthetic_structsim.py:114-125)
        return 6, [(i, (i + 1) % 6) for i in range(6)] + [(5, 1), (4, 2)]
    if name == "clique":
        # complete graph, optionally nb_to_remove random edges removed
        # (synthetic_structsim.py:12-46)
        n = args[0] if args else 5
        rm = args[1] if len(args) > 1 else 0
        edges = [(u, v) for u in range(n) for v in range(u + 1, n)]
        if rm:
            assert rng is not None, "clique edge-removal needs an rng"
            drop = set(rng.choice(len(edges), rm, replace=False).tolist())
            edges = [e for i, e in enumerate(edges) if i not in drop]
        return n, edges
    if name == "tree":
        # balanced r-ary tree of given height (synthetic_structsim.py:73-88)
        height = args[0] if args else 2
        r = args[1] if len(args) > 1 else 10
        t = nx.balanced_tree(r, height)
        return t.number_of_nodes(), list(t.edges())
    if name == "ba":
        # BA preferential-attachment graph as a motif (synthetic_structsim.py:91-111)
        width = args[0] if args else 10
        m = args[1] if len(args) > 1 else 5
        seed = int(rng.integers(2**31)) if rng is not None else None
        b = nx.barabasi_albert_graph(width, m, seed=seed)
        return width, list(b.edges())
    if name == "grid":
        # default 2x3 (synthetic_structsim.py:198-204; utils.py grid class)
        dim = args[0] if args else (2, 3)
        return _grid_edges(*dim)
    raise ValueError(shape)


def build_graph(
    context: str,
    shape: str,
    node_num: int,
    rng: np.random.Generator,
    nb_shapes: int = 1,
) -> nx.Graph:
    """Basis + attached motif(s) (synthetic_structsim.py:207-288)."""
    if context == "ba":
        g = nx.barabasi_albert_graph(node_num ** 2, 2, seed=int(rng.integers(2**31)))
    elif context == "tree":
        g = nx.balanced_tree(node_num, 2)
    else:
        raise ValueError(context)
    n_basis = g.number_of_nodes()
    # motifs attach at random basis nodes, sampled without replacement
    # (rdm_basis_plugins=True, synthetic_structsim.py:247-248)
    plugins = rng.choice(n_basis, nb_shapes, replace=False)
    start = n_basis
    for k in range(nb_shapes):
        n_s, edges = _motif_edges(shape, rng)
        g.add_nodes_from(range(start, start + n_s))
        g.add_edges_from([(start + u, start + v) for u, v in edges])
        g.add_edge(start, int(plugins[k]))  # attach (synthetic_structsim.py:270)
        start += n_s
    return g


def perturb(g: nx.Graph, p: float, rng: np.random.Generator) -> nx.Graph:
    """Add ``p * num_edges`` random non-existing edges (gengraph.py:13-33)."""
    extra = int(g.number_of_edges() * p)
    n = g.number_of_nodes()
    for _ in range(extra):
        while True:
            u = int(rng.integers(0, n))
            v = int(rng.integers(0, n))
            if u != v and not g.has_edge(u, v):
                break
        g.add_edge(u, v)
    return g


def degree_onehot(g: nx.Graph, max_degree: int) -> np.ndarray:
    """One-hot degree capped at max_degree-1 (featgen.py:21-28)."""
    n = g.number_of_nodes()
    x = np.zeros((n, max_degree), np.float32)
    for node, deg in g.degree():
        x[node, min(deg, max_degree - 1)] = 1.0
    return x


def nx_to_host_graph(g: nx.Graph, y: int, x: np.ndarray) -> HostGraph:
    """Undirected nx graph -> both-direction edge list (PyG from_networkx)."""
    if g.number_of_edges():
        e = np.asarray(list(g.edges()), np.int32)
        senders = np.concatenate([e[:, 0], e[:, 1]])
        receivers = np.concatenate([e[:, 1], e[:, 0]])
    else:
        senders = receivers = np.zeros((0,), np.int32)
    return HostGraph(x=x, senders=senders, receivers=receivers, y=y)


def make_graph(
    context: str,
    shape: str,
    label: int,
    node_num: int,
    max_degree: int,
    noise: float,
    rng: np.random.Generator,
    shape_num: int = 1,
    feature_dim: int = -1,
) -> HostGraph:
    g = build_graph(context, shape, node_num, rng, shape_num)
    if noise:
        g = perturb(g, noise, rng)
    if feature_dim >= 0:
        # reference utils.py:43-47: ConstFeatureGen(np.random.uniform(0, 1,
        # feature_dim)) — a fresh uniform vector per GRAPH, constant across
        # that graph's nodes (structure carries all class signal)
        x = const_features(g, rng.uniform(0.0, 1.0, feature_dim))
    else:
        x = degree_onehot(g, max_degree)
    return nx_to_host_graph(g, label, x)


def generate_synthetic_dataset(
    data_num: int = 2000,
    node_num: int = 15,
    max_degree: int = 10,
    noise: float = 0.1,
    shape_num: int = 1,
    seed: int = 666,
    cache_path: str | None = None,
    feature_dim: int = -1,
) -> Dict[str, Dict[str, List[HostGraph]]]:
    """dataset[context][shape] = data_num HostGraphs (utils.py:59-89)."""
    if cache_path and os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            cached = pickle.load(f)
        # Validate the cache actually matches the requested size — the
        # reference loads its cache blindly (main_syn.py:19), so a run with
        # a different --data_num would silently train on the wrong dataset.
        if all(len(cached[c][s]) == data_num
               for c in cached for s in cached[c]):
            return cached
    rng = np.random.default_rng(seed)
    dataset: Dict[str, Dict[str, List[HostGraph]]] = {c: {} for c in SYN_CONTEXTS}
    for label, shape in enumerate(SYN_CLASSES):
        for context in SYN_CONTEXTS:
            dataset[context][shape] = [
                make_graph(
                    context, shape, label, node_num, max_degree, noise, rng,
                    shape_num, feature_dim=feature_dim,
                )
                for _ in range(data_num)
            ]
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        with open(cache_path, "wb") as f:
            pickle.dump(dataset, f)
    return dataset


def dataset_bias_split(
    dataset,
    bias: float,
    split=(7, 1, 2),
    total: int = 8000,
    num_classes: int = 4,
    seed: int | None = None,
):
    """Confounded train/val vs balanced test split (utils.py:123-159).

    Train & val: P(tree | house) = bias, P(tree | other) = 1 - bias.
    Test: 50/50 tree/ba per class — the OOD evaluation.
    """
    bias_dict = {s: (bias if s == "house" else 1.0 - bias) for s in SYN_CLASSES}
    tr_ds, ba_ds = dataset["tree"], dataset["ba"]
    tr_split = total * split[0] / 10 / num_classes
    va_split = total * split[1] / 10 / num_classes
    te_split = total * split[2] / 10 / num_classes
    train, val, test = [], [], []
    edges_num = 0
    for shape in SYN_CLASSES:
        # context-recovery threshold: mean edge count of one sample per
        # (class, context) (utils.py:151-158 print_graph_info + `the`)
        edges_num += tr_ds[shape][0].num_edges + ba_ds[shape][0].num_edges
        b = bias_dict[shape]
        n_tr_t, n_tr_b = int(tr_split * b), int(tr_split * (1 - b))
        n_va_t, n_va_b = int(va_split * b), int(va_split * (1 - b))
        n_te_t, n_te_b = int(te_split * 0.5), int(te_split * 0.5)
        t, a = tr_ds[shape], ba_ds[shape]
        train += t[:n_tr_t] + a[:n_tr_b]
        val += t[n_tr_t : n_tr_t + n_va_t] + a[n_tr_b : n_tr_b + n_va_b]
        test += (
            t[n_tr_t + n_va_t : n_tr_t + n_va_t + n_te_t]
            + a[n_tr_b + n_va_b : n_tr_b + n_va_b + n_te_b]
        )
    rng = np.random.default_rng(seed)
    for lst in (train, val, test):
        rng.shuffle(lst)
    the = float(edges_num) / (num_classes * 2)     # utils.py:158
    return train, val, test, the


# --------------------------------------------------------------------------
# dataset composition report (utils.py:160-205) — context recovered post-hoc
# by edge-count threshold `the`
# --------------------------------------------------------------------------

def print_dataset_info(train_set, val_set, test_set, the: int):
    """Reference ``print_dataset_info``: per-split tables of class x context
    counts, where context (tree vs ba) is inferred by comparing each graph's
    directed edge count against threshold ``the`` (utils.py:175-205)."""
    out = {}
    for title, ds in (("Train", train_set), ("Val   ", val_set),
                      ("Test  ", test_set)):
        tr = [0] * len(SYN_CLASSES)
        ba = [0] * len(SYN_CLASSES)
        for g in ds:
            (ba if g.num_edges > the else tr)[g.y] += 1
        total = sum(tr) + sum(ba)
        print("-" * 150)
        print(f"{title} Total:{total}")
        print("| Tree: House:{:<5d}, Cycle:{:<5d}, Grids:{:<5d}, Diams:{:<5d} ".format(*tr))
        print("| BA  : House:{:<5d}, Cycle:{:<5d}, Grids:{:<5d}, Diams:{:<5d} ".format(*ba))
        alls = [a + b for a, b in zip(tr, ba)]
        print("| All : House:{:<5d}, Cycle:{:<5d}, Grids:{:<5d}, Diams:{:<5d} ".format(*alls))
        bias = [100.0 * t / max(a, 1) for t, a in zip(tr, alls)]
        print("| BIAS: House:{:.1f}%, Cycle:{:.1f}%, Grids:{:.1f}%, Diams:{:.1f}%".format(*bias))
        print("-" * 150)
        out[title.strip()] = np.asarray(ba + tr, np.float32)
    return out


# --------------------------------------------------------------------------
# feature generators (featgen.py:14-75) — ConstFeatureGen's degree-one-hot
# path is `degree_onehot` above; these are the remaining generators
# --------------------------------------------------------------------------

def const_features(g: nx.Graph, val: np.ndarray) -> np.ndarray:
    """ConstFeatureGen with an explicit value vector (featgen.py:14-31)."""
    return np.tile(np.asarray(val, np.float32), (g.number_of_nodes(), 1))


def gaussian_features(
    g: nx.Graph, mu: np.ndarray, sigma: np.ndarray,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """GaussianFeatureGen (featgen.py:34-48): N(mu, diag(sigma)) per node."""
    rng = rng or np.random.default_rng()
    sigma = np.asarray(sigma, np.float64)
    if sigma.ndim < 2:
        sigma = np.diag(sigma)
    return rng.multivariate_normal(
        np.asarray(mu, np.float64), sigma, g.number_of_nodes()
    ).astype(np.float32)


def grid_features(
    g: nx.Graph, mu: float, sigma: float, com_choices,
    rng: np.random.Generator | None = None,
):
    """GridFeatureGen (featgen.py:51-75): [community(deg<4 ? c0 : c1), noise]."""
    rng = rng or np.random.default_rng()
    nodes = list(g.nodes())
    community = {n: (com_choices[0] if g.degree(n) < 4 else com_choices[1])
                 for n in nodes}
    s = rng.normal(mu, sigma, len(nodes))
    x = np.asarray([[community[n], s[i]] for i, n in enumerate(nodes)],
                   np.float32)
    return x, community
