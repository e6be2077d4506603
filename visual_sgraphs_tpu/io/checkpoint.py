"""Checkpoint / resume: full-state serialization with integrity checksum.

Replaces the reference's boost::serialization Atlas archive
(System::SaveAtlas/LoadAtlas, System.cc:1161/1217, MD5 via
CalculateCheckSum :1280) — and goes further: the reference's checkpoint
covers only the ORB-SLAM3 core state (scene-graph entities are *not*
serialized, SURVEY §5.4); here the archive is the complete pytree — map,
scene graph, BoW database rows and trajectory — so a resumed session has
everything.

Format: one ``.npz`` with a flattened pytree (every leaf a numpy array) plus
a JSON manifest and an embedded MD5 of the payload bytes.
"""

from __future__ import annotations

import hashlib
import io as _io
import json

import jax
import numpy as np


def _flatten(tag: str, tree) -> dict:
    leaves, treedef = jax.tree.flatten(tree)
    return (
        {f"{tag}.{i}": np.asarray(l) for i, l in enumerate(leaves)},
        str(treedef),
    )


def save_checkpoint(path: str, system, scenegraph=None, loop_db=None):
    """Write the full session state. ``system``: SlamSystem."""
    arrays = {}
    manifest = {"version": 1}

    leaves, _ = jax.tree.flatten(system.map)
    for i, l in enumerate(leaves):
        arrays[f"map.{i}"] = np.asarray(l)
    manifest["map_leaves"] = len(leaves)

    sg = scenegraph if scenegraph is not None else system.scenegraph
    if sg is not None:
        sleaves, _ = jax.tree.flatten(sg.state)
        for i, l in enumerate(sleaves):
            arrays[f"sg.{i}"] = np.asarray(l)
        manifest["sg_leaves"] = len(sleaves)

    lc = loop_db if loop_db is not None else getattr(system, "loop_closer",
                                                    None)
    if lc is not None and lc.db is not None:
        arrays["db.bow"] = np.asarray(lc.db.bow)
        arrays["db.has_word"] = np.asarray(lc.db.has_word)
        arrays["db.valid"] = np.asarray(lc.db.valid)
        if lc.vocab is not None:
            arrays["vocab.idf"] = np.asarray(lc.vocab.idf)
            manifest["vocab_levels"] = len(lc.vocab.centers)
            for i, c in enumerate(lc.vocab.centers):
                arrays[f"vocab.level_{i}"] = np.asarray(c)

    traj = system.trajectory
    if traj:
        arrays["traj.ts"] = np.asarray([t for t, _, _, _, _ in traj])
        arrays["traj.epoch"] = np.asarray(
            [e for _, e, _, _, _ in traj], np.int32
        )
        arrays["traj.ref"] = np.asarray(
            [r for _, _, r, _, _ in traj], np.int32
        )
        arrays["traj.rel"] = np.stack([p for _, _, _, p, _ in traj])
        arrays["traj.tracked"] = np.asarray(
            [k for _, _, _, _, k in traj], bool
        )
    arrays["state.last_pose"] = np.asarray(system.last_pose)
    arrays["state.velocity"] = np.asarray(system.velocity)
    arrays["state.ref_kf"] = np.asarray(system.ref_kf)

    buf = _io.BytesIO()
    np.savez_compressed(buf, **arrays)
    payload = buf.getvalue()
    manifest["md5"] = hashlib.md5(payload).hexdigest()
    with open(path, "wb") as f:
        head = json.dumps(manifest).encode()
        f.write(len(head).to_bytes(8, "little"))
        f.write(head)
        f.write(payload)
    return manifest["md5"]


def load_checkpoint(path: str, system, scenegraph=None, loop_closer=None):
    """Restore state saved by ``save_checkpoint`` into ``system`` (and the
    optional scene-graph manager / loop closer).  Verifies the MD5 before
    touching any state (LoadAtlas's corruption check, System.cc:1230)."""
    import jax.numpy as jnp

    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        manifest = json.loads(f.read(n))
        payload = f.read()
    if hashlib.md5(payload).hexdigest() != manifest["md5"]:
        raise ValueError(f"checkpoint {path}: MD5 mismatch (corrupt file)")
    data = np.load(_io.BytesIO(payload))

    leaves = [jnp.asarray(data[f"map.{i}"])
              for i in range(manifest["map_leaves"])]
    _, treedef = jax.tree.flatten(system.map)
    system.map = jax.tree.unflatten(treedef, leaves)

    sg = scenegraph if scenegraph is not None else system.scenegraph
    if sg is not None and "sg_leaves" in manifest:
        sleaves = [jnp.asarray(data[f"sg.{i}"])
                   for i in range(manifest["sg_leaves"])]
        _, sdef = jax.tree.flatten(sg.state)
        sg.state = jax.tree.unflatten(sdef, sleaves)

    lc = loop_closer if loop_closer is not None else getattr(
        system, "loop_closer", None)
    if lc is not None and "db.bow" in data:
        from visual_sgraphs_tpu.place.database import PlaceDB
        from visual_sgraphs_tpu.place.vocab import VocabTree

        lc.db = PlaceDB(
            bow=jnp.asarray(data["db.bow"]),
            has_word=jnp.asarray(data["db.has_word"]),
            valid=jnp.asarray(data["db.valid"]),
        )
        if "vocab.idf" in data:
            lc.vocab = VocabTree(
                centers=tuple(
                    jnp.asarray(data[f"vocab.level_{i}"])
                    for i in range(manifest["vocab_levels"])
                ),
                idf=jnp.asarray(data["vocab.idf"]),
            )

    if "traj.ts" in data:
        system.trajectory = [
            (float(t), int(e), int(r), p, bool(k))
            for t, e, r, p, k in zip(
                data["traj.ts"], data["traj.epoch"], data["traj.ref"],
                data["traj.rel"], data["traj.tracked"],
            )
        ]
    system.last_pose = jnp.asarray(data["state.last_pose"])
    system.velocity = jnp.asarray(data["state.velocity"])
    system.ref_kf = jnp.asarray(data["state.ref_kf"])
    from visual_sgraphs_tpu.slam.system import TrackState

    if int(system.map.n_kf) > 0:
        system.state = TrackState.OK
    return manifest
