"""Model/vocab artifact save-load (spark-submit shippable, no pickle).

Reference behavior (saber/saber.py:130-218, base_model.py:23-52,
generic_utils.py:38-71): save = model JSON + weights HDF5 + PICKLED
type_to_idx/idx_to_tag + config copy, optionally tar.bz2'd; load reverses
it (plus Google-Drive download for named pretrained models — out of scope:
hermetic sandbox).

Rebuild: everything JSON (auditable, language-neutral, no pickle execution
risk) + .npz for matrices. The artifact directory ships to executors via
``spark-submit --py-files/--archives``; ``load_model_payload`` returns the
broadcast-ready payload consumed by operators.tagger._build_model.
"""

from __future__ import annotations

import json
import os
import tarfile

import numpy as np

MANIFEST = "model.json"
EMBEDDINGS_NPZ = "embeddings.npz"
WEIGHTS_NPZ = "weights.npz"


def save_model_dir(path: str, *, kind: str,
                   surface_map: dict[tuple[str, ...], str],
                   word_to_idx: dict[str, int] | None = None,
                   embedding_matrix: np.ndarray | None = None,
                   weights: dict[str, np.ndarray] | None = None,
                   config: dict | None = None) -> str:
    """Write a model artifact directory; returns the manifest path.

    ``weights``: the fitted model matrices (viterbi: emissions,
    transitions) — the HDF5-weights analogue (saber/base_model.py:23-52),
    stored as one .npz so a reloaded model predicts identically.
    """
    os.makedirs(path, exist_ok=True)
    manifest = {
        "format_version": 1,
        "kind": kind,
        # JSON keys must be strings: encode token tuples with \\x1f
        "surface_map": {"\x1f".join(k): v for k, v in surface_map.items()},
        "word_to_idx": word_to_idx,
        "config": config or {},
        "has_embeddings": embedding_matrix is not None,
        "has_weights": weights is not None,
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    if embedding_matrix is not None:
        np.savez_compressed(os.path.join(path, EMBEDDINGS_NPZ),
                            matrix=embedding_matrix)
    if weights is not None:
        np.savez_compressed(os.path.join(path, WEIGHTS_NPZ), **weights)
    return os.path.join(path, MANIFEST)


def load_model_payload(path: str) -> dict:
    """Artifact dir -> broadcast payload for the tagging stage."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format_version") != 1:
        raise ValueError(f"unsupported artifact version in {path}")
    surface_map = {tuple(k.split("\x1f")): v
                   for k, v in manifest["surface_map"].items()}
    kind = manifest["kind"]
    if kind == "dict":
        return surface_map
    if kind == "viterbi":
        if not manifest.get("word_to_idx"):
            raise ValueError("viterbi artifact requires word_to_idx")
        payload = {"kind": "viterbi", "surface_map": surface_map,
                   "word_to_idx": manifest["word_to_idx"],
                   "config": manifest.get("config", {})}
        if manifest.get("has_weights"):
            with np.load(os.path.join(path, WEIGHTS_NPZ)) as npz:
                payload["weights"] = {k: npz[k] for k in npz.files}
        return payload
    raise ValueError(f"unknown model kind {kind!r}")


def pack_archive(model_dir: str, archive_path: str) -> str:
    """tar.bz2 the artifact dir (parity: generic_utils.py:38-50)."""
    with tarfile.open(archive_path, "w:bz2") as tar:
        tar.add(model_dir, arcname=os.path.basename(model_dir))
    return archive_path


def unpack_archive(archive_path: str, dest_dir: str) -> str:
    """Extract a packed artifact (parity: generic_utils.py:52-71)."""
    with tarfile.open(archive_path, "r:bz2") as tar:
        tar.extractall(dest_dir, filter="data")
    entries = [d for d in os.listdir(dest_dir)
               if os.path.isdir(os.path.join(dest_dir, d))]
    if len(entries) != 1:
        raise ValueError(f"expected one model dir in {archive_path}")
    return os.path.join(dest_dir, entries[0])
