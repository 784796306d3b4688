"""AOT serving export: serialize the engine's jitted cores to disk.

Production serving should not depend on the model-building Python (flax
modules, config schema, converter) being importable — or on retracing at
process start. `export_engine` captures the engine's greedy-decode graph
with `jax.export` (StableHLO, versioned serialization) for a fixed set of
batch sizes, alongside the folded weights and the host-side vocabularies;
`ExportedEngine` reloads the bundle and serves `predict()` with the same
output contract as `GPVEngine.predict` (reference `inference.py:24-47`:
answer / relevance-sorted boxes / relevance), padding partial batches up to
the nearest exported bucket.

The serialized modules are platform-checked by jax.export (a TPU export
refuses to run on CPU), and XLA compilation still happens at load — what
the bundle removes is every Python-side dependency above the runtime:
no flax, no model code, no tracing. Weights ride as a separate msgpack
tree so they can be refreshed without re-exporting the graphs.

No reference counterpart (the reference serves by unpickling the full
torch module); this is the TPU-native deployment artifact.

Bundles are single-device: export captures the engine's graph without mesh
shardings (an exported sharded module pins the device topology into the
artifact, which defeats portable deployment). For multi-chip serving run
one `ExportedEngine`/`GPVServer` per chip behind the HTTP front-end, or use
a live `GPVEngine(mesh=...)` for data-parallel batches.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

MANIFEST = "manifest.json"
WEIGHTS = "weights.msgpack"


def _greedy_bundle_fns(engine):
    """(masked, unmasked) greedy fns with a stable exported signature."""
    def greedy(variables, images_u8, qids, qvalid):
        return engine._greedy_fn(variables, images_u8, qids, qvalid, None)

    def greedy_mask(variables, images_u8, qids, qvalid, vocab_mask):
        return engine._greedy_fn(variables, images_u8, qids, qvalid,
                                 vocab_mask)
    return greedy, greedy_mask


def export_engine(engine, out_dir, batch_sizes: Sequence[int] = (1, 8, 20),
                  image_hw=(480, 640)) -> dict:
    """Serialize greedy-decode executables + weights + vocabs to `out_dir`.

    For each batch size B, two modules are exported: `greedy_b{B}.jaxexp`
    (no vocab mask) and `greedy_mask_b{B}.jaxexp` (additive (V,) f32 mask —
    the classification-eval path). Returns the manifest dict.
    """
    import jax
    from jax import export as jexport
    from flax import serialization

    if getattr(engine, "mesh", None) is not None:
        raise ValueError(
            "export_engine requires a single-device engine: a mesh engine's "
            "export would pin the device topology into the bundle (see "
            "module docstring). Build the engine without mesh= / with "
            "tpu.infer_data_parallel=1 for export.")

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    variables = engine.variables  # device-committed, BN-folded
    H, W = int(image_hw[0]), int(image_hw[1])
    T = engine.max_query_len
    V = len(engine.vocab)
    var_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
    greedy, greedy_mask = _greedy_bundle_fns(engine)

    modules = {}
    for B in sorted(set(int(b) for b in batch_sizes)):
        img = jax.ShapeDtypeStruct((B, H, W, 3), np.uint8)
        qids = jax.ShapeDtypeStruct((B, T), np.int32)
        qvalid = jax.ShapeDtypeStruct((B, T), np.bool_)
        vmask = jax.ShapeDtypeStruct((V,), np.float32)
        for name, fn, args in (
                (f"greedy_b{B}", greedy, (var_shapes, img, qids, qvalid)),
                (f"greedy_mask_b{B}", greedy_mask,
                 (var_shapes, img, qids, qvalid, vmask))):
            exp = jexport.export(jax.jit(fn))(*args)
            (out / f"{name}.jaxexp").write_bytes(exp.serialize())
            modules[name] = {"batch": B, "masked": "mask" in name,
                             "platforms": list(exp.platforms)}

    (out / WEIGHTS).write_bytes(
        serialization.msgpack_serialize(jax.device_get(variables)))
    manifest = {
        "format_version": 1,
        "image_hw": [H, W],
        "max_query_len": T,
        "vocab_size": V,
        "batch_sizes": sorted(set(int(b) for b in batch_sizes)),
        "modules": modules,
        "answer_vocab": list(engine.vocab.words),
        "wordpiece_vocab": list(engine.tokenizer.vocab),
        "jax_version": jax.__version__,
    }
    (out / MANIFEST).write_text(json.dumps(manifest))
    return manifest


class ExportedEngine:
    """Serving runtime over an `export_engine` bundle.

    Loads nothing but the manifest, the weights msgpack, and the serialized
    StableHLO modules; `predict` matches `GPVEngine.predict` (answer /
    boxes / relevance per item), padding a partial batch by repetition up
    to the smallest exported bucket that fits.
    """

    def __init__(self, bundle_dir):
        import jax
        from jax import export as jexport
        from flax import serialization
        from .text.vocab import AnswerVocab
        from .text.wordpiece import WordPieceTokenizer

        self.dir = Path(bundle_dir)
        self.manifest = json.loads((self.dir / MANIFEST).read_text())
        if self.manifest.get("format_version") != 1:
            raise ValueError(
                f"unsupported bundle format {self.manifest.get('format_version')}")
        self.vocab = AnswerVocab(self.manifest["answer_vocab"])
        self.tokenizer = WordPieceTokenizer(self.manifest["wordpiece_vocab"])
        self.max_query_len = int(self.manifest["max_query_len"])
        self.image_hw = tuple(self.manifest["image_hw"])
        self.batch_sizes = [int(b) for b in self.manifest["batch_sizes"]]
        weights_host = serialization.msgpack_restore(
            (self.dir / WEIGHTS).read_bytes())
        self.variables = jax.device_put(weights_host)
        self._fns = {}
        for name, meta in self.manifest["modules"].items():
            exp = jexport.deserialize(
                (self.dir / f"{name}.jaxexp").read_bytes())
            self._fns[(int(meta["batch"]), bool(meta["masked"]))] = \
                jax.jit(exp.call)

    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        raise ValueError(
            f"batch of {n} exceeds the largest exported bucket "
            f"{self.batch_sizes[-1]}")

    def predict(self, images_uint8, queries: List[str],
                vocab_mask: Optional[np.ndarray] = None):
        import jax.numpy as jnp

        images = np.asarray(images_uint8)
        n = len(queries)
        if images.shape[1:3] != self.image_hw:
            raise ValueError(
                f"exported for images {self.image_hw}, got "
                f"{images.shape[1:3]} — resize on the client or re-export")
        B = self._bucket(n)
        if B != n:  # pad by repetition: one executable per bucket
            reps = [images[i % n] for i in range(B)]
            images = np.stack(reps)
            queries = [queries[i % n] for i in range(B)]
        qids, qvalid = self.tokenizer.batch_encode(queries,
                                                   self.max_query_len)
        fn = self._fns[(B, vocab_mask is not None)]
        args = [self.variables, jnp.asarray(images), jnp.asarray(qids),
                jnp.asarray(qvalid)]
        if vocab_mask is not None:
            args.append(jnp.asarray(vocab_mask, np.float32))
        tokens, boxes, rel = fn(*args)
        answers = self.vocab.decode_ids(np.asarray(tokens))
        boxes, rel = np.asarray(boxes), np.asarray(rel)
        return [{"answer": answers[i], "boxes": boxes[i],
                 "relevance": rel[i]} for i in range(n)]
