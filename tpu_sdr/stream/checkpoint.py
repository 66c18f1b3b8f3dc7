"""Streaming-state checkpoint / resume.

The reference has no persistence — its only cross-block state is the demod
carries (`demod_pre`, boxcar accumulators, simple_fm.rs:232-239) which die
with the process.  Here "resume" means exactly that streaming-state carry
(SURVEY.md §5): every streamer's carries (scan states, halo buffers,
fractional phases, pending bytes) serialize to one ``.npz`` so a receiver
can stop and resume mid-stream with bit-identical output.

Works generically over any streamer object: every attribute in
``_STATE_ATTRS`` that exists is flattened with ``jax.tree_util`` and stored;
loading unflattens against the live object's own tree structure (so the
streamer must be constructed with the same config first).
"""

from __future__ import annotations

import numpy as np

_STATE_ATTRS = (
    "state", "states", "resamp_hist", "resamp_hists", "phase", "phases",
    "_pending",
)

_FORMAT_VERSION = 2


def save_stream_state(path: str, streamer) -> None:
    """Serialize a streamer's carries to ``path`` (.npz).

    The checkpoint records which attributes were captured and how many
    leaves each flattened to, so :func:`load_stream_state` can verify
    round-trip completeness instead of silently skipping drifted state.
    """
    import jax

    saved: list[str] = []
    payload: dict[str, np.ndarray] = {
        "__version__": np.int64(_FORMAT_VERSION),
        "__class__": np.str_(type(streamer).__name__),
    }
    for attr in _STATE_ATTRS:
        if not hasattr(streamer, attr):
            continue
        saved.append(attr)
        leaves, _ = jax.tree_util.tree_flatten(getattr(streamer, attr))
        payload[f"{attr}.__n__"] = np.int64(len(leaves))
        for i, leaf in enumerate(leaves):
            payload[f"{attr}.{i}"] = np.asarray(leaf)
    payload["__attrs__"] = np.str_(",".join(saved))
    np.savez(path, **payload)


def load_stream_state(path: str, streamer) -> None:
    """Restore carries saved by :func:`save_stream_state` into a freshly
    constructed streamer of the same class/config (in place)."""
    import jax
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    saved_cls = str(data["__class__"])
    if saved_cls != type(streamer).__name__:
        raise ValueError(
            f"checkpoint is for {saved_cls}, not {type(streamer).__name__}")
    live = [a for a in _STATE_ATTRS if hasattr(streamer, a)]
    if "__attrs__" in data:  # format >= 2: completeness both ways
        saved = [a for a in str(data["__attrs__"]).split(",") if a]
        if saved != live:
            raise ValueError(
                f"checkpoint state attrs {saved} != live streamer's {live} "
                "(renamed/added carry attribute? config mismatch?)")
    for attr in live:
        current = getattr(streamer, attr)
        leaves, treedef = jax.tree_util.tree_flatten(current)
        nkey = f"{attr}.__n__"
        if nkey in data and int(data[nkey]) != len(leaves):
            raise ValueError(
                f"{attr}: checkpoint has {int(data[nkey])} leaves, live "
                f"state flattens to {len(leaves)} (structure drift)")
        new_leaves = []
        for i, leaf in enumerate(leaves):
            key = f"{attr}.{i}"
            if key not in data:
                raise ValueError(f"checkpoint missing {key} "
                                 f"(config mismatch?)")
            loaded = data[key]
            # pending byte buffers legitimately vary in length; fixed state
            # must match (config mismatch guard)
            if attr != "_pending" and hasattr(leaf, "shape"):
                if np.shape(loaded) != np.shape(leaf):
                    raise ValueError(
                        f"{key}: shape {np.shape(loaded)} != {np.shape(leaf)}")
            if isinstance(leaf, np.ndarray):
                new_leaves.append(loaded.astype(leaf.dtype, copy=False))
            elif isinstance(leaf, (int, float)):
                new_leaves.append(type(leaf)(loaded))
            else:  # jax array
                new_leaves.append(jnp.asarray(loaded))
        setattr(streamer, attr, jax.tree_util.tree_unflatten(treedef, new_leaves))
