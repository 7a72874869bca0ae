"""Checkpoint / resume of reconstruction state.

The reference has no checkpointing at all -- ``run`` returns final arrays
and users save .npy manually (SURVEY.md SS5). Here a nested dict of
arrays (psi, prb, metrics, solver state) round-trips through a single
``.npz`` file; the container contract is dicts-of-dicts-of-arrays only
(lists/tuples and non-dict roots are rejected with TypeError rather than
silently mangled). Complex arrays are stored as (real, imag) float pairs
so the save path never performs a complex device->host transfer (see
tikejax.utils.hostio) and the files are readable by plain numpy.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from tikejax.utils import hostio

_COMPLEX_SUFFIX_RE = "__re"
_COMPLEX_SUFFIX_IM = "__im"
_SEP = "/"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            k = str(k)
            if _SEP in k:
                raise ValueError(f"checkpoint key may not contain '{_SEP}': "
                                 f"{k!r}")
            if k.endswith(_COMPLEX_SUFFIX_RE) or k.endswith(
                    _COMPLEX_SUFFIX_IM):
                raise ValueError(
                    f"checkpoint key may not end with the reserved "
                    f"complex-part suffixes '{_COMPLEX_SUFFIX_RE}'/"
                    f"'{_COMPLEX_SUFFIX_IM}': {k!r}")
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
        return out
    if isinstance(tree, (list, tuple)):
        raise TypeError(
            "checkpoint containers must be nested dicts of arrays; got a "
            f"{type(tree).__name__} at {prefix or '<root>'!r} -- convert "
            "it to a dict (e.g. {'0': ..., '1': ...}) or stack it into "
            "one array")
    key = prefix[:-1] if prefix.endswith(_SEP) else prefix
    out[key] = tree
    return out


def save(path: str, tree) -> None:
    """Save a nested dict of arrays to ``path`` (.npz)."""
    if not isinstance(tree, dict):
        raise TypeError(
            "checkpoint root must be a dict of arrays, got "
            f"{type(tree).__name__}")
    flat = _flatten(tree)
    arrays = {}
    for k, v in flat.items():
        host = hostio.to_host(v)
        if np.iscomplexobj(host):
            arrays[k + _COMPLEX_SUFFIX_RE] = host.real
            arrays[k + _COMPLEX_SUFFIX_IM] = host.imag
        else:
            arrays[k] = host
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load(path: str, device: bool = False):
    """Load a checkpoint saved by :func:`save`.

    Returns a nested dict of numpy arrays (or device arrays if
    ``device=True``, uploaded complex-safely).
    """
    with np.load(path) as z:
        flat = {}
        for k in z.files:
            if k.endswith(_COMPLEX_SUFFIX_IM):
                continue
            if k.endswith(_COMPLEX_SUFFIX_RE):
                base = k[:-len(_COMPLEX_SUFFIX_RE)]
                flat[base] = z[k] + 1j * z[base + _COMPLEX_SUFFIX_IM]
            else:
                flat[k] = z[k]
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = hostio.to_device(v) if device else v
    return tree
