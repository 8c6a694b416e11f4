"""Keras-3 ``.keras`` archive weight importer — no tensorflow dependency.

Lets a user of the reference pipeline bring a released tf.keras model
(saved by kerasmodel.save, reference src/ml_tools/kerasmodel.py:455-462)
and run it through the Flax zoo (models/zoo.py / models/wr_resnet.py) with
numerically-equal inference. The reference's interpreter consumes released
``.keras`` artifacts directly (reference src/ml_tools/interpreter.py:569-583);
this module is the TPU-native analog: FlaxInterpreter accepts a ``.keras``
model_file and imports its weights into the matching Flax classifier.

A ``.keras`` file is a zip of ``config.json`` (the layer graph, in build
order) and ``model.weights.h5``. Weight groups are keyed by keras' own
auto-generated names: per container, ``to_snake_case(class_name)`` deduped
with a ``_N`` suffix in config order (user layer names are ignored by the
saver — verified empirically on keras 3.13). Nested Functional/Sequential
submodels recurse under ``<group>/layers``.

Mapping to Flax is by per-kind build order: the zoo modules were written to
call their layers in exactly the keras applications' build order, so the
N-th keras Conv2D corresponds to the N-th Flax Conv (4-D kernel), the N-th
Dense to the N-th 2-D kernel, the N-th BatchNormalization to the N-th BN
module. Every copy is shape-checked, and the oracle tests
(tests/test_keras_import.py) assert output equality against tf.keras.

BatchNorm epsilon: keras families use eps 1e-3 or 1.001e-5 while Flax
defaults to 1e-5. Inference-mode BN is ``(x - mean)/sqrt(var + eps)``, so
the importer folds the difference into the imported running variance
(``var' = var + eps_keras - eps_flax``) — exact at inference, which is the
only regime imported models run in (the reference likewise only infers with
released models).
"""

from __future__ import annotations

import io
import json
import logging
import re
import zipfile
from pathlib import Path

import numpy as np

FLAX_BN_EPS = 1e-5  # flax.linen.BatchNorm default; the zoo never overrides it
# Families whose flax twins override the BN epsilon (wr_resnet uses the
# keras default 1e-3 so TRAIN-mode numerics match the reference exactly —
# see wr_resnet.BasicBlock.bn_eps); the importer folds var by
# (keras_eps - flax_eps), so it must know the target module's epsilon.
MODEL_BN_EPS = {"wr-resnet": 1e-3}


def _snake(name: str) -> str:
    """keras.src.backend.common.naming.to_snake_case."""
    name = re.sub(r"\W+", "", name)
    name = re.sub("(.)([A-Z][a-z]+)", r"\1_\2", name)
    return re.sub("([a-z])([A-Z])", r"\1_\2", name).lower()


def read_keras_layers(path):
    """Parse a .keras archive into ``[(class_name, layer_config, weights)]``
    in build order, with nested submodels flattened in place."""
    with zipfile.ZipFile(path) as zf:
        cfg = json.loads(zf.read("config.json"))
        h5_bytes = zf.read("model.weights.h5")
    import h5py

    out = []
    with h5py.File(io.BytesIO(h5_bytes), "r") as h5:

        def walk(layer_cfgs, group):
            counts: dict[str, int] = {}
            for lc in layer_cfgs:
                cls = lc["class_name"]
                base = _snake(cls)
                n = counts.get(base, 0)
                counts[base] = n + 1
                gname = base if n == 0 else f"{base}_{n}"
                if cls in ("Functional", "Sequential"):
                    sub = group[gname]["layers"] if gname in group else {}
                    walk(lc["config"]["layers"], sub)
                    continue
                weights = []
                if gname in group and "vars" in group[gname]:
                    vs = group[gname]["vars"]
                    weights = [np.asarray(vs[str(i)]) for i in range(len(vs))]
                out.append((cls, lc.get("config", {}), weights))

        walk(cfg["config"]["layers"], h5["layers"] if "layers" in h5 else {})
    return out


def _depthwise_to_flax(kernel):
    """keras depthwise kernel (h, w, cin, mult) -> flax grouped-conv kernel
    (h, w, 1, cin*mult). Only mult == 1 occurs in the zoo's families."""
    h, w, cin, mult = kernel.shape
    if mult != 1:
        raise NotImplementedError(
            f"depth_multiplier={mult} depthwise convs are not in the zoo"
        )
    return kernel.transpose(0, 1, 3, 2)


def _keras_entries(layers, flax_bn_eps=FLAX_BN_EPS):
    """Normalize keras layers into ``(kind, cls, name, sub, tensors)``
    import entries, in config order."""
    entries = []
    for cls, cfg, w in layers:
        name = cfg.get("name", "")
        if cls == "Conv2D":
            e = {"kernel": w[0]}
            if cfg.get("use_bias", True):
                e["bias"] = w[1]
            entries.append(("conv", cls, name, 0, e))
        elif cls == "DepthwiseConv2D":
            e = {"kernel": _depthwise_to_flax(w[0])}
            if cfg.get("use_bias", True):
                e["bias"] = w[1]
            entries.append(("conv", cls, name, 0, e))
        elif cls == "SeparableConv2D":
            # one keras layer == two flax convs (depthwise, then pointwise;
            # bias, if any, lives on the pointwise)
            entries.append(
                ("conv", cls, name, 0, {"kernel": _depthwise_to_flax(w[0])})
            )
            e = {"kernel": w[1]}
            if cfg.get("use_bias", True):
                e["bias"] = w[2]
            entries.append(("conv", cls, name, 1, e))
        elif cls == "Dense":
            e = {"kernel": w[0]}
            if cfg.get("use_bias", True):
                e["bias"] = w[1]
            entries.append(("dense", cls, name, 0, e))
        elif cls == "BatchNormalization":
            i = 0
            e = {}
            if cfg.get("scale", True):
                e["scale"] = w[i]
                i += 1
            if cfg.get("center", True):
                e["bias"] = w[i]
                i += 1
            e["mean"] = w[i]
            # fold the epsilon difference into the running variance: exact
            # at inference (see module docstring)
            eps = float(cfg.get("epsilon", 1e-3))
            e["var"] = w[i + 1] + np.float32(eps - flax_bn_eps)
            entries.append(("bn", cls, name, 0, e))
        elif w:
            if cls in ("Normalization", "Rescaling"):
                # EfficientNet v1 embeds Rescaling+Normalization; the zoo
                # expresses them as PREPROCESS functions (zoo.py:915-919).
                # An un-adapted Normalization is identity; warn if not.
                if cls == "Normalization" and len(w) >= 2 and (
                    np.any(np.asarray(w[0]) != 0) or np.any(np.asarray(w[1]) != 1)
                ):
                    logging.warning(
                        "keras_import: adapted Normalization layer dropped — "
                        "imported predictions will differ from the source "
                        "model unless preprocessing is adjusted"
                    )
                continue
            raise NotImplementedError(
                f"keras layer {cls} carries weights but has no flax mapping"
            )
    return entries


def _sort_kind(group):
    """Recover CREATION order for one kind's entries.

    The Functional config serializes layers in graph-traversal order, which
    for branchy graphs (InceptionV3's mixed blocks — verified empirically)
    differs from source build order; the Flax zoo follows source build
    order. Keras assigns auto-names with per-class creation counters at
    layer construction, so when every entry of a kind is one class and
    auto-named (``<snake(cls)>`` / ``<snake(cls)>_N``), sorting by N is
    exactly build order. Custom-named builders (reference WRResNet, keras
    resnet/mobilenet/efficientnet) keep config order, which the oracle
    tests pin as correct for them.
    """
    classes = {cls for _, cls, _, _, _ in group}
    if len(classes) != 1:
        return group
    base = _snake(next(iter(classes)))
    pat = re.compile(re.escape(base) + r"(?:_(\d+))?$")
    auto = []  # (index in group, sort key)
    for i, (_, _, name, sub, _) in enumerate(group):
        m = pat.fullmatch(name or "")
        if m:
            auto.append((i, (int(m.group(1) or 0), sub)))
    if not auto:
        return group  # fully custom-named: keep config order
    # Sort the auto-named subset by creation counter, leaving custom-named
    # entries (e.g. InceptionResNetV2's final "conv_7b" amid auto convs) at
    # their config positions — correct when, as in the keras applications,
    # the custom-named layers sit on the linear spine where config order ==
    # build order. Any wrong guess is caught by the import shape checks and
    # the per-family oracle tests.
    out = list(group)
    slots = [i for i, _ in auto]
    ordered = sorted(auto, key=lambda t: t[1])
    for slot, (src, _) in zip(slots, ordered):
        out[slot] = group[src]
    return out


# ---------------------------------------------------------------------------
# NASNet: keras names every layer (no creation counters to sort by) and the
# Functional config serializes its cell graph in a topo order that
# interleaves branches across cells, so build-order pairing cannot work.
# Instead the names themselves are fully systematic (keras nasnet.py:
# _normal_a_cell/_reduction_a_cell/_adjust_block/_separable_conv_block), and
# the Flax twin (zoo.NASNetLarge) names its modules to mirror them — so
# NASNet imports by NAME. The tokens below map a keras sep-block position to
# the Flax sep-block module name (keras calls the reduction cell's last
# branch "left4"; the twin calls it "left5" to match its x5 output slot).
# ---------------------------------------------------------------------------

_NASNET_POS = {
    "normal_left1": "left1", "normal_right1": "right1",
    "normal_left2": "left2", "normal_right2": "right2",
    "normal_left5": "left5",
    "reduction_left1": "left1", "reduction_right1": "right1",
    "reduction_right2": "right2", "reduction_right3": "right3",
    "reduction_left4": "left5",
}
_NASNET_SEP = re.compile(
    r"^separable_conv_([12])(_bn)?_(%s)_(.+)$" % "|".join(_NASNET_POS)
)
_NASNET_ADJ = re.compile(r"^adjust_(conv_1|conv_2|conv_projection|bn)_(.+)$")
_NASNET_CELL1 = re.compile(r"^(?:normal|reduction)_(conv_1|bn_1)_(.+)$")


def _nasnet_cell_name(block_id):
    """keras block_id -> Flax cell module name (zoo.NASNetLarge.__call__)."""
    if block_id.startswith("stem") or block_id.startswith("reduce"):
        return block_id
    return f"normal_{block_id}"


def _nasnet_relpath(name, sub):
    """Map one keras nasnet layer name (+ sub-index for the two convs of a
    SeparableConv2D) to the Flax param path relative to the NASNet module.
    Returns None for names that are not nasnet-patterned (e.g. a classifier
    head on top of the backbone)."""
    if name == "stem_conv1" or name == "stem_bn1":
        return (name,)
    m = _NASNET_SEP.match(name)
    if m:
        idx, is_bn, pos, bid = m.groups()
        leaf = f"bn{idx}" if is_bn else (f"dw{idx}" if sub == 0 else f"pw{idx}")
        return (_nasnet_cell_name(bid), _NASNET_POS[pos], leaf)
    m = _NASNET_ADJ.match(name)
    if m:
        kind, bid = m.groups()
        return (_nasnet_cell_name(bid), f"adjust_{kind}")
    m = _NASNET_CELL1.match(name)
    if m:
        kind, bid = m.groups()
        return (_nasnet_cell_name(bid), kind)
    return None


def _nasnet_order(kentries, fpaths, kind, anchor):
    """Order one kind's keras entries to match the Flax path list by name.

    Flax paths are anchored at the NASNet module root (``anchor``, the path
    prefix of the ``stem_conv1`` conv). Entries whose names don't parse as
    nasnet layers (head layers above the backbone) pair with the leftover
    Flax paths in config order, as in the default importer."""
    by_path = {}
    unmatched = []
    for e in kentries:
        rel = _nasnet_relpath(e[2], e[3])
        if rel is None:
            unmatched.append(e[4])
        else:
            by_path[anchor + rel] = e[4]
    ordered = []
    for p in fpaths:
        if p in by_path:
            ordered.append(by_path.pop(p))
        elif unmatched:
            ordered.append(unmatched.pop(0))
        else:
            raise ValueError(
                f"nasnet import: no keras {kind} layer maps to flax module "
                f"{'/'.join(p)}"
            )
    if by_path or unmatched:
        raise ValueError(
            f"nasnet import: {len(by_path) + len(unmatched)} keras {kind} "
            f"layers found no flax module (e.g. "
            f"{['/'.join(p) for p in list(by_path)[:3]]})"
        )
    return ordered


def _flax_entries(params, batch_stats):
    """Walk the variables tree in insertion (== construction == call) order
    and classify each leaf-module as conv / dense / bn."""
    entries = []

    def visit(p, bs, path):
        leaves = {k for k, v in p.items() if not isinstance(v, dict)}
        if "kernel" in leaves:
            kind = "conv" if p["kernel"].ndim == 4 else "dense"
            entries.append((kind, path))
            return
        if leaves & {"scale", "bias"} and isinstance(bs, dict) and "mean" in bs:
            entries.append(("bn", path))
            return
        if leaves:
            raise NotImplementedError(
                f"flax module at {'/'.join(path)} has unrecognized params "
                f"{sorted(leaves)} — extend keras_import to map it"
            )
        for k, v in p.items():
            visit(v, bs.get(k, {}) if isinstance(bs, dict) else {}, path + (k,))

    visit(params, batch_stats, ())
    return entries


def _set_leaf(tree, path, leaf, value, like):
    node = tree
    for k in path:
        node = node[k]
    if tuple(value.shape) != tuple(np.shape(node[leaf])):
        raise ValueError(
            f"shape mismatch importing {'/'.join(path)}/{leaf}: keras "
            f"{tuple(value.shape)} vs flax {tuple(np.shape(node[leaf]))}"
        )
    node[leaf] = np.asarray(value, dtype=like)


def _to_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def import_keras_weights(variables, keras_path, flax_bn_eps=FLAX_BN_EPS):
    """Return a new variables pytree with every conv/dense/bn weight
    replaced by the matching weight from the .keras archive.

    flax_bn_eps: the BatchNorm epsilon the TARGET flax modules use (the
    var fold is keras_eps - flax_bn_eps); see MODEL_BN_EPS."""
    keras_path = Path(keras_path)
    kentries = _keras_entries(read_keras_layers(keras_path), flax_bn_eps)
    params = _to_mutable(variables["params"])
    batch_stats = _to_mutable(variables.get("batch_stats", {}))
    fentries = _flax_entries(params, batch_stats)

    by_kind_k: dict[str, list] = {"conv": [], "dense": [], "bn": []}
    by_kind_f: dict[str, list] = {"conv": [], "dense": [], "bn": []}
    for entry in kentries:
        by_kind_k[entry[0]].append(entry)
    for kind, p in fentries:
        by_kind_f[kind].append(p)
    nasnet = any(e[2] == "reduction_conv_1_stem_1" for e in kentries)
    anchor = None
    if nasnet:
        for p in by_kind_f["conv"]:
            if p[-1] == "stem_conv1":
                anchor = p[:-1]
        if anchor is None:
            raise ValueError(
                "nasnet import: no stem_conv1 module in the flax tree"
            )
    for kind in ("conv", "dense", "bn"):
        if nasnet:
            ordered = _nasnet_order(by_kind_k[kind], by_kind_f[kind], kind,
                                    anchor)
        else:
            ordered = [e[4] for e in _sort_kind(by_kind_k[kind])]
        nk, nf = len(ordered), len(by_kind_f[kind])
        if nk != nf:
            raise ValueError(
                f"{keras_path.name}: {nk} keras {kind} layers vs {nf} flax "
                f"{kind} modules — architectures do not correspond"
            )
        for e, path in zip(ordered, by_kind_f[kind]):
            if kind == "bn":
                if "scale" in e:
                    _set_leaf(params, path, "scale", e["scale"], np.float32)
                if "bias" in e:
                    _set_leaf(params, path, "bias", e["bias"], np.float32)
                _set_leaf(batch_stats, path, "mean", e["mean"], np.float32)
                _set_leaf(batch_stats, path, "var", e["var"], np.float32)
            else:
                _set_leaf(params, path, "kernel", e["kernel"], np.float32)
                if "bias" in e:
                    _set_leaf(params, path, "bias", e["bias"], np.float32)
                elif "bias" in _leaf_names(params, path):
                    raise ValueError(
                        f"flax module {'/'.join(path)} has a bias but the "
                        f"keras layer does not"
                    )
    out = dict(variables)
    out["params"] = params
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def _leaf_names(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return set(node)
