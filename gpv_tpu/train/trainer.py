"""Multitask trainer (the L6 experiment runtime).

Behavior spec: reference `exp/gpv/train_distr.py` — per-epoch in-train eval of
all configured tasks, best-selection-metric checkpointing (sum of
vqa_acc + cider + det_mAP + cls_acc, :380-394), TensorBoard scalars every
`log_step`, HTML box visualizations every `vis_step`, resume restoring
step/epoch, 2-phase frozen-DETR schedule driven by `training.freeze`.
`finetune` mode reproduces `finetune_distr.py`: eval = refexp mAP only every
`eval_every` epochs, resume does NOT restore step/epoch (:268-278).

TPU-native: one process drives the whole mesh (no mp.spawn/DDP); the hot loop
is the jitted sharded train step; in-train eval reuses the jitted GPVEngine.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ..datasets.coco import CocoMultitaskDataset
from ..datasets.loader import Collator, DataLoader
from ..engine import GPVEngine
from ..losses.criterion import LossConfig
from ..models.gpv import build_gpv
from ..parallel.mesh import (initialize_distributed, mesh_from_config,
                             shard_batch, validate_multihost_mesh)
from ..parallel.train_step import create_train_state, make_train_step
from ..text.vocab import AnswerVocab
from ..text.wordpiece import WordPieceTokenizer
from ..utils.html_writer import HtmlWriter
from ..utils.visualize import save_vis, vis_sample
from . import metrics as train_metrics
from .checkpoint import (load_imagenet_backbone, load_pretr_detr,
                         load_torch_state_dict,
                         convert_gpv_torch, restore_checkpoint,
                         save_checkpoint)
from .optimizer import build_optimizer


def _norm_to_uint8(image_f32_norm: np.ndarray) -> np.ndarray:
    mean = np.asarray([0.485, 0.456, 0.406])
    std = np.asarray([0.229, 0.224, 0.225])
    x = (image_f32_norm * std + mean) * 255.0
    return np.clip(x, 0, 255).astype(np.uint8)


class Trainer:
    def __init__(self, cfg, finetune: bool = False):
        self.cfg = cfg
        self.finetune = finetune
        cache_dir = cfg.tpu.get("compile_cache_dir")
        if cache_dir:
            # persistent XLA compile cache: a restarted/resumed run (or the
            # phase-2 launch of train.sh) skips every unchanged executable
            jax.config.update("jax_compilation_cache_dir", str(cache_dir))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1)
        self.dtype = (jnp.bfloat16
                      if str(cfg.tpu.dtype) == "bfloat16" else jnp.float32)
        # multi-host: join the cluster BEFORE the first backend touch so
        # jax.devices() is global; rank-0-only side effects mirror the
        # reference's DDP rank gating (train_distr.py:327-460)
        initialize_distributed(cfg.tpu)
        self.is_main = jax.process_index() == 0
        self.mesh = mesh_from_config(cfg.tpu)
        validate_multihost_mesh(self.mesh)
        # how long non-main ranks wait at rank-skew barriers while rank 0
        # evals/visualizes/checkpoints (see _sync). Generous default: a
        # barrier timeout converts a slow eval into a CLUSTER-WIDE crash
        # (the waiting ranks raise and tear the coordinator down under
        # rank 0), so it should only fire on a genuine hang.
        dist_cfg = cfg.tpu.get("distributed") if hasattr(cfg.tpu, "get") \
            else None
        self._barrier_timeout_min = float(
            dist_cfg.get("barrier_timeout_min", 720.0)
            if dist_cfg else 720.0)
        # overlap checkpoint disk writes with training (orbax
        # AsyncCheckpointer; the device->host fetch stays synchronous)
        self._async_ckpt = bool(cfg.training.get("async_checkpoint", False))

        # vocab / tokenizer
        if cfg.model.vocab:
            self.vocab = AnswerVocab.load(cfg.model.vocab)
        else:
            self.vocab = AnswerVocab.debug()
        bert_vocab = cfg.model.get("bert_vocab")
        self.tokenizer = (WordPieceTokenizer.load(bert_vocab) if bert_vocab
                          else WordPieceTokenizer.debug())

        self.model = build_gpv(cfg.model, vocab_size=len(self.vocab),
                               dtype=self.dtype,
                               remat=bool(cfg.tpu.get("remat", False)))

        # datasets
        self.datasets = {}
        for subset in ("train", "val"):
            self.datasets[subset] = CocoMultitaskDataset(
                cfg.learning_datasets, cfg.task_configs, subset,
                training=(subset == "train"))
        query_dedup = bool(cfg.training.get("query_dedup", False))
        if query_dedup and jax.process_count() > 1:
            # per-host unique counts differ, so per-host dedup emissions
            # would disagree in shape/presence across the global batch
            # assembly — reject loudly rather than desync the cluster
            raise ValueError(
                "training.query_dedup=true requires a single host process "
                "(per-host unique-query buckets cannot be made consistent "
                "across a sharded loader); unset it for multi-host runs")
        self.collator = Collator(
            self.vocab, self.tokenizer,
            max_text_len=int(cfg.model.max_text_len),
            max_target_boxes=int(cfg.model.get("max_target_boxes", 64)),
            answering_type=str(cfg.model.answering_type),
            dedup_queries=query_dedup)
        if query_dedup:
            # the whole batch pytree is sharded on the mesh data axis
            # (train_step in_shardings), including query_uniq_* whose
            # leading dim U is a dedup_bucket multiple capped at B — every
            # reachable U must divide the data axis or jit fails mid-epoch
            # on the first batch that hits an off-size bucket. Validate the
            # bucket the CONSTRUCTED collator uses, not the class default
            # (the constructor accepts an override).
            from ..parallel.mesh import DATA_AXIS
            ds = int(self.mesh.shape[DATA_AXIS])
            if self.collator.dedup_bucket % ds != 0:
                raise ValueError(
                    f"training.query_dedup=true: dedup bucket "
                    f"{self.collator.dedup_bucket} must be divisible by the "
                    f"mesh data axis ({ds}) — every emitted U is a bucket "
                    f"multiple capped at the batch size")
        batch_size = int(cfg.training.batch_size)
        if cfg.training.get("freeze", False):
            # frozen phase trains at its own global batch (reference
            # train_distr.py:485-486 overwrites batch_size with
            # frozen_batch_size when freeze=True)
            batch_size = int(cfg.training.get("frozen_batch_size",
                                              batch_size))
        self.loaders = {
            s: DataLoader(d, self.collator, batch_size,
                          shuffle=(s == "train"),
                          num_workers=int(cfg.training.num_workers),
                          seed=0, num_shards=jax.process_count(),
                          shard_id=jax.process_index())
            for s, d in self.datasets.items()}

        # model init + pretrained DETR
        rng = jax.random.PRNGKey(0)
        H = int(cfg.task_configs.image_size.H)
        W = int(cfg.task_configs.image_size.W)
        variables = self.model.init(
            rng, jnp.zeros((1, H, W, 3)), jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, 4), jnp.int32), train=False)
        variables = {"params": jax.device_get(variables["params"]),
                     "batch_stats": jax.device_get(
                         variables.get("batch_stats", {}))}
        if cfg.model.vocab_embed:
            ve = np.load(cfg.model.vocab_embed).astype(np.float32)
            variables["params"]["vocab_embed"] = ve
        matched_detr = None  # reference init_detr_params (checkpoint.py)
        if cfg.model.pretr_detr:
            variables, matched_detr = load_pretr_detr(variables,
                                                      cfg.model.pretr_detr)
        elif cfg.model.get("pretr_backbone"):
            # from-scratch recipe: ImageNet ResNet-50 only (the reference's
            # torchvision pretrained backbone, exp/gpv/models/backbone.py:68)
            variables = load_imagenet_backbone(variables,
                                               cfg.model.pretr_backbone)

        freeze = bool(cfg.training.get("freeze", False))
        if freeze and matched_detr is not None:
            # freeze EXACTLY the checkpoint-initialized keys (reference
            # init_detr_params, train_distr.py:136-140); any detr param the
            # checkpoint didn't cover keeps training in phase 1
            n_leaves = len(jax.tree.leaves(variables["params"]["detr"]))
            if len(matched_detr) < n_leaves:
                import warnings
                warnings.warn(
                    f"training.freeze: only {len(matched_detr)}/{n_leaves} "
                    "detr params were initialized from "
                    f"{cfg.model.pretr_detr}; the rest keep training "
                    "(reference freezes only loaded keys)", RuntimeWarning)
        elif freeze and matched_detr is None:
            import warnings
            warnings.warn(
                "training.freeze without model.pretr_detr: the reference "
                "freezes only checkpoint-loaded DETR params, so nothing "
                "would be frozen upstream; freezing the randomly-"
                "initialized detr subtree anyway", RuntimeWarning)

        steps_per_epoch = max(len(self.loaders["train"]), 1)
        self.optimizer = build_optimizer(cfg.training, steps_per_epoch,
                                         variables["params"],
                                         frozen_detr_paths=matched_detr)
        self.state = create_train_state(variables, self.optimizer)
        self.train_step = make_train_step(
            self.model, self.optimizer, LossConfig.from_config(cfg.losses),
            float(cfg.training.clip_max_norm), mesh=self.mesh,
            grad_accum=int(cfg.training.get("grad_accum_steps", 1)),
            freeze_detr=freeze, frozen_detr_paths=matched_detr,
            donate=bool(cfg.tpu.get("donate_buffers", True)))

        # in-train eval engine. tpu.infer_data_parallel shards eval batches
        # over N LOCAL devices (-1 = all) so a slice doesn't idle 7/8 chips
        # during epoch evals. Works multi-host too: eval stays rank-0-gated,
        # and rank 0 shards over its OWN host's chips — jax.local_devices()
        # is fully addressable per process, which is all GPVEngine's mesh
        # requires (the other ranks build an engine they never predict
        # with; its weights never commit — lazy `variables`).
        infer_mesh = None
        n_dp = int(cfg.tpu.get("infer_data_parallel", 1) or 1)
        if n_dp != 1:
            devs = jax.local_devices()
            n_dp = len(devs) if n_dp < 0 else min(n_dp, len(devs))
            if n_dp > 1:
                infer_mesh = jax.sharding.Mesh(
                    np.asarray(devs[:n_dp]), ("dp",))
        self.engine = GPVEngine(self.model, variables, self.vocab,
                                self.tokenizer, mesh=infer_mesh)

        self.step = 0
        self.last_epoch = -1
        self.best_metric = 0.0
        self.best_epoch = -1

        self.writer = None
        if cfg.get("tb_dir") and self.is_main:
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(log_dir=str(cfg.tb_dir))
            except Exception as e:
                # a long run silently producing zero scalars is worse than
                # a loud warning (VERDICT.md round-1 weak #7)
                import warnings
                warnings.warn(
                    f"TensorBoard logging DISABLED: tb_dir={cfg.tb_dir!r} "
                    f"was requested but the writer failed to initialize "
                    f"({type(e).__name__}: {e}); training continues without "
                    "scalars", RuntimeWarning, stacklevel=2)

        if cfg.training.get("ckpt"):
            self._resume(cfg.training.ckpt)
        elif cfg.training.get("auto_resume") and \
                (Path(cfg.ckpt_dir) / "last").exists():
            # preemption recovery: a re-launched run picks up the rolling
            # 'last' checkpoint (training.ckpt_step) without a manual path.
            # The reference has no preemption story (SURVEY.md §5: recovery
            # = manual restart with training.ckpt).
            print(f"auto_resume: restoring {Path(cfg.ckpt_dir) / 'last'}")
            self._resume(Path(cfg.ckpt_dir) / "last")
            # the rolling ckpt's meta has no selection metric; without this
            # the next eval (metric > 0.0) would OVERWRITE the best 'model'
            # checkpoint with a worse model
            best_meta = Path(cfg.ckpt_dir) / "model.meta.json"
            if best_meta.exists():
                import json
                m = json.loads(best_meta.read_text())
                self.best_metric = float(
                    m.get("model_selection_metric", self.best_metric))
                self.best_epoch = int(m.get("epoch", self.best_epoch))

    # ------------------------------------------------------------------

    def _resume(self, ckpt_path):
        ckpt_path = Path(ckpt_path)
        if ckpt_path.suffix == ".pth":
            # torch checkpoint (released reference weights)
            sd = load_torch_state_dict(ckpt_path)
            converted = convert_gpv_torch(sd)
            self.state = self.state.replace(
                params=jax.tree.map(jnp.asarray, converted["params"]),
                batch_stats=jax.tree.map(jnp.asarray,
                                         converted["batch_stats"]))
            return
        payload, meta = restore_checkpoint(ckpt_path.parent, self.state,
                                           name=ckpt_path.name)
        self.state = self.state.replace(
            params=payload["params"], batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            step=jnp.asarray(payload["step"], jnp.int32))
        if not self.finetune:
            # finetune_distr deliberately does not restore step/epoch
            self.step = int(payload["step"])
            self.last_epoch = int(meta.get("epoch", -1))
        self.best_metric = float(meta.get("model_selection_metric", 0.0))
        self.best_epoch = int(meta.get("epoch", -1))

    def _eval_variables(self):
        """Variables for rank-0 eval/vis.

        On a multi-process mesh, state.params after the first jitted step
        are GLOBAL arrays spanning non-addressable devices: a single-process
        jit dispatch over them deadlocks (every process must participate)
        and even eager ops (engine's fold_frozen_bn) are rejected. They are
        fully replicated (out_shardings=P()), so each process's shard 0
        already holds the complete value — materialize that local replica
        to host numpy and let the engine run on this process's devices
        alone. Matches the reference's rank-0 eval with rank-local weights
        (train_distr.py:327-394).
        """
        params, stats = self.state.params, self.state.batch_stats
        if jax.process_count() > 1:
            from .checkpoint import _host_value
            params = jax.tree.map(_host_value, params)
            stats = jax.tree.map(_host_value, stats)
        return {"params": params, "batch_stats": stats}

    # ------------------------------------------------------------------

    def evaluate(self, subset: str = "val") -> Dict[str, float]:
        """In-train eval over the configured tasks -> metric dict +
        selection metric (reference :327-385)."""
        cfg = self.cfg
        self.engine.variables = self._eval_variables()
        nvs = cfg.training.num_val_samples
        eval_bs = int(cfg.eval.batch_size)
        nw = int(cfg.eval.get("num_workers", 8))
        results: Dict[str, float] = {}
        selection = 0.0
        ds = CocoMultitaskDataset(cfg.learning_datasets, cfg.task_configs,
                                  subset, training=False)
        for name, sub in zip(ds.names, ds.datasets):
            if name == "CocoVqa":
                acc = train_metrics.vqa_accuracy(
                    self.engine, sub, eval_bs, int(nvs.get("coco_vqa", 1000)),
                    num_workers=nw)
                results["vqa_acc"] = acc
                selection += acc
            elif name == "CocoCaptioning":
                scores = train_metrics.cap_metrics(
                    self.engine, sub, eval_bs, int(nvs.get("coco_cap", 1000)),
                    num_workers=nw)
                results["cider"] = float(scores.get("Cider", 0.0))
                results["bleu4"] = float(scores.get("Bleu4", 0.0))
                selection += results["cider"]
            elif name == "CocoClassification":
                m = train_metrics.cls_metrics(
                    self.engine, sub, eval_bs, int(nvs.get("coco_cls", 1000)),
                    num_workers=nw)
                results["cls_acc"] = m["accuracy"]
                selection += m["accuracy"]
            elif name == "CocoDetection":
                m = train_metrics.det_metrics(
                    self.engine, sub, eval_bs, int(nvs.get("coco_det", 1000)),
                    num_workers=nw)
                results["det_map"] = m["mAP"]
                selection += m["mAP"]
            elif name == "RefCocop":
                m = train_metrics.refexp_metrics(
                    self.engine, sub, eval_bs,
                    int(nvs.get("refcocop", 1000)), num_workers=nw)
                results["refexp_map"] = m["mAP"]
                selection += m["mAP"]
        if self.finetune:
            selection = results.get("refexp_map", 0.0)
        results["model_selection_metric"] = selection
        return results

    def visualize(self, subset: str, step: int):
        """HTML dump of predictions vs GT (reference visualize(), :40-133)."""
        cfg = self.cfg
        self.engine.variables = self._eval_variables()
        vis_dir = (Path(cfg.exp_dir) / "training_visualizations"
                   / f"{subset}_{step}")
        vis_dir.mkdir(parents=True, exist_ok=True)
        ds = self.datasets[subset]
        rng = np.random.RandomState(step)
        n = min(int(cfg.training.num_vis_samples), len(ds))
        idxs = rng.choice(len(ds), size=n, replace=False)
        items = [ds.get(int(i), rng) for i in idxs]
        outs = self.engine.predict(
            np.stack([it["image"] for it in items]),
            [it["query"] for it in items])
        html = HtmlWriter(vis_dir / "index.html")
        html.add_row(["query", "gt answer", "pred answer", "image"])
        for i, (it, out) in enumerate(zip(items, outs)):
            img = vis_sample(it["image"], out["boxes"], out["relevance"],
                             it.get("boxes"), answer=out["answer"])
            save_vis(img, vis_dir / f"{i}.jpg")
            html.add_row([it["query"], it.get("answer", ""),
                          out["answer"], html.image_tag(f"{i}.jpg")])
        html.close()

    def save(self, epoch: int, results: Dict[str, float]):
        meta = {"epoch": epoch, "step": self.step,
                "model_selection_metric":
                    results.get("model_selection_metric", 0.0)}
        meta.update(results)
        save_checkpoint(self.cfg.ckpt_dir, self.state, meta,
                        async_write=self._async_ckpt)

    # ------------------------------------------------------------------

    def train(self):
        cfg = self.cfg
        num_epochs = int(cfg.training.num_epochs)
        if cfg.training.get("freeze"):
            num_epochs = int(cfg.training.frozen_epochs)
        rng = jax.random.PRNGKey(1)
        eval_every = int(cfg.training.get("eval_every", 1))
        launch = True
        step_warm = False

        for epoch in range(self.last_epoch + 1, num_epochs):
            run_eval = (epoch % eval_every == 0) or (epoch == num_epochs - 1)
            # rank-0-only eval/vis/ckpt, matching the reference's DDP
            # rank gating (train_distr.py:327-394)
            run_eval = run_eval and self.is_main
            if run_eval and (not launch
                             or cfg.training.get("run_eval_at_launch", True)):
                results = self.evaluate("val")
                sel = results["model_selection_metric"]
                if self.writer:
                    for k, v in results.items():
                        self.writer.add_scalar(f"val/{k}", v, self.step)
                print(f"epoch {epoch} eval: {results}")
                if sel > self.best_metric or self.best_epoch < 0:
                    self.best_metric = sel
                    self.best_epoch = epoch
                    self.save(epoch, results)
            if launch and self.is_main and \
                    cfg.training.get("run_vis_at_launch", True):
                self.visualize("train", self.step)
            launch = False
            # re-align ranks after the rank-0-only eval/vis before the
            # first sharded step of the epoch
            self._sync(f"gpv_epoch_{epoch}")

            loader = self.loaders["train"]
            loader.set_epoch(epoch)
            from ..utils.profiling import StepTimer
            timer = StepTimer()
            t0 = time.time()
            profile_step = cfg.training.get("profile_step")
            for it, batch in enumerate(loader):
                timer.tick()
                if profile_step is not None:
                    if self.step == int(profile_step):
                        jax.profiler.start_trace(str(cfg.tb_dir))
                    elif self.step == int(profile_step) + 3:
                        jax.profiler.stop_trace()
                # uint8 host batch -> device_put straight to the batch
                # sharding; cast+normalize run INSIDE the jitted step
                # (train_step.step_fn), so there are no eager dispatches or
                # default-device staging between loader and step
                batch = shard_batch(batch, self.mesh)
                if not step_warm and jax.process_count() > 1:
                    # compile BEFORE first execution, then re-align ranks:
                    # Gloo/ICI collective-context setup has a hard ~30 s
                    # KV timeout, and ranks whose compile times diverge
                    # (cold vs warm persistent cache) would enter the
                    # first collective too far apart
                    self.train_step.lower(self.state, batch, rng).compile()
                    self._sync("gpv_step_compiled")
                    step_warm = True
                self.state, losses = self.train_step(self.state, batch, rng)
                self.step += 1
                if self.step % int(cfg.training.log_step) == 0:
                    tl = float(losses["total_loss"])
                    dt = time.time() - t0
                    print(f"epoch {epoch} it {it} step {self.step} "
                          f"loss {tl:.4f} ({dt / (it + 1):.2f}s/it)")
                    if self.writer:
                        for k, v in losses.items():
                            self.writer.add_scalar(
                                f"train/{k}", float(v), self.step)
                        self.writer.add_scalar(
                            "train/steps_per_sec", timer.steps_per_sec(),
                            self.step)
                if self.step % int(cfg.training.vis_step) == 0:
                    if self.is_main:
                        self.visualize("train", self.step)
                    # all ranks pause together: a long rank-0-only stall
                    # would leave the others blocked inside a timed
                    # collective
                    self._sync(f"gpv_vis_{self.step}")
                if self.step % int(cfg.training.ckpt_step) == 0:
                    if self.is_main:
                        # rolling 'last' checkpoint for preemption recovery
                        # (beyond the reference, which only saves on metric
                        # improvement — SURVEY.md §5 failure detection:
                        # none)
                        save_checkpoint(cfg.ckpt_dir, self.state,
                                        {"epoch": epoch, "step": self.step},
                                        name="last",
                                        async_write=self._async_ckpt)
                    self._sync(f"gpv_ckpt_{self.step}")

        # final eval + save (rank 0; other hosts return empty results).
        # Non-main ranks WAIT at a coordination-service barrier instead of
        # exiting: a process leaving the cluster while rank 0 still
        # evaluates would tear the coordinator down mid-eval.
        if not self.is_main:
            self._sync("gpv_train_end")
            return {}
        results = self.evaluate("val")
        if (results["model_selection_metric"] > self.best_metric
                or self.best_epoch < 0):
            self.save(num_epochs - 1, results)
        from .checkpoint import wait_for_saves
        wait_for_saves()  # async writes must land before the run returns
        self._sync("gpv_train_end")
        return results

    def _sync(self, name: str):
        """Cross-process barrier at rank-skew points.

        Uses the coordination-service KV barrier, NOT a device collective:
        rank 0's eval/vis can take many minutes, and a waiting rank must
        not trip a Gloo/ICI collective-context timeout (~30 s) in the
        meantime. The barrier timeout (default 12 h, configurable via
        `tpu.distributed.barrier_timeout_min`) is deliberately generous:
        when it fires, the WAITING ranks raise and leave the cluster,
        tearing the coordination service down under rank 0 mid-eval — so
        it must only trip on a genuine hang, never on a long eval/vis/save.
        """
        if jax.process_count() <= 1:
            return
        from jax._src import distributed
        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(
                name,
                timeout_in_ms=int(self._barrier_timeout_min * 60_000))
