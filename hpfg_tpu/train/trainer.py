"""The training harness.

The reference copies the same setup/loop/eval/checkpoint boilerplate into
every algorithm script (sup_ACDC.py:59-125, 2017_03…py:63-162, main.py:79-289);
here ONE Trainer drives any Algorithm:

  * jits the algorithm's step with donated state (params/opt/EMA stay in HBM,
    no per-iteration re-allocation),
  * shards batches over the data mesh (single chip = degenerate mesh),
  * logs scalars to TensorBoard without forcing a device sync every step,
  * evaluates every ``step_size`` iterations with the batched volume
    evaluator and checkpoints per-model best dice (reference cadence:
    config step_size, e.g. 200/1500),
  * supports exact resume.
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import numpy as np

from hpfg_tpu.data import build_loader
from hpfg_tpu.evals.volume import (
    SliceForward,
    evaluate_images,
    evaluate_volumes_multi,
)
from hpfg_tpu.parallel.mesh import get_mesh, shard_batch
from hpfg_tpu.train.algorithms.base import eval_variables
from hpfg_tpu.utils.checkpoint import CheckpointManager
from hpfg_tpu.utils.logging import get_logger, mk_path
from hpfg_tpu.utils.tb import TBWriter

VOLUME_DATASETS = {"acdc", "sup_acdc", "synapse", "sup_synapse"}


@jax.jit
def _stack_metrics(pending: list) -> "jax.Array":
    """[{name: scalar}] → [N, K] in one compiled program (eager stacks are
    one tunnel round-trip EACH on this setup). Callers pad ``pending`` to a
    fixed window length — jit specializes on the list length, and an
    unpadded call would compile one program per distinct flush size (log
    boundary vs eval boundary vs final flush)."""
    import jax.numpy as jnp

    return jnp.stack([jnp.stack([m[k] for k in sorted(m)]) for m in pending])


class Trainer:
    def __init__(self, cfg, algorithm, loaders=None, workdir: str | None = None,
                 enable_tb: bool = True, log_every: int = 20):
        from hpfg_tpu.parallel.distributed import is_main_process

        self.cfg = cfg
        self.algorithm = algorithm
        # multi-host: every process computes (sharded global programs need
        # all participants) but only process 0 writes logs/TB/checkpoints
        self.is_main = is_main_process()
        self.workdir = workdir or cfg.get("save_path", "checkpoint/run")
        if self.is_main:
            mk_path(self.workdir)
        self.logger = get_logger(os.path.join(self.workdir, "log.log")
                                 if self.is_main else None)
        if not self.is_main:
            import logging

            self.logger.setLevel(logging.WARNING)
        self.writer = TBWriter(os.path.join(self.workdir, "tensorboardX")
                               if enable_tb and self.is_main else None)
        # NOT gated: orbax coordinates multi-host saves itself — every
        # process must call save()/restore() (process 0 commits metadata)
        self.ckpt = CheckpointManager(os.path.join(self.workdir, "model"))
        self.log_every = log_every

        self.loaders = loaders if loaders is not None else build_loader(cfg)
        self.test_loader = self.loaders[-1]
        self.mesh = get_mesh()
        # Overlapped evaluation (TPU-first; the reference blocks its hot loop
        # on val.py inside the training loop, sup_ACDC.py:99-116): evaluate a
        # tree_copy SNAPSHOT of the state on a worker thread so the volume
        # eval's host work (H2D of val slices, scipy zoom, metric EDTs)
        # overlaps training compute. Device executes still serialize with
        # train steps (same in-process runtime — safe, unlike concurrent
        # processes), but the eval's host-side wall leaves the hot path.
        # Results are bit-identical to the synchronous path: same params.
        self.async_eval = bool(cfg.get("async_eval", True))
        self._eval_pool = None
        self._eval_future = None
        self._jit_snapshot = None

        self.total_itrs = int(cfg.total_itrs)
        self.step_size = int(cfg.step_size)
        self.num_classes = int(cfg.get("num_classes", 4))
        self.test_crop = tuple(cfg.get("test_crop_size", cfg.train_crop_size))

        self.device_augment = bool(cfg.get("device_augment", False))
        self._aug_rng = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 777)
        self._aug_counter = 0
        # the prefetcher ships batches in a compressed wire format (f16/u8,
        # see data/prefetch.py); restore dtypes INSIDE the jit (free cast; a
        # no-op when batches arrive uncompressed — restore is dtype-keyed)
        self.wire_compress = bool(cfg.get("wire_compress", True))
        from hpfg_tpu.data.prefetch import restore_wire_dtypes

        algo_step = self.algorithm.step
        if self.device_augment:
            # fuse augmentation INTO the step: one Execute per iteration
            # (each dependent Execute pays a full round-trip on the tunnel)
            from hpfg_tpu.ops.augment import augment_batch_dict

            aug_rng = self._aug_rng

            def fused_step(state, batch, counter):
                batch = augment_batch_dict(aug_rng, counter,
                                           restore_wire_dtypes(batch))
                return algo_step(state, batch)

            self._jit_step = jax.jit(fused_step, donate_argnums=(0,))
        else:
            def plain_step(state, batch):
                return algo_step(state, restore_wire_dtypes(batch))

            self._jit_step = jax.jit(plain_step, donate_argnums=(0,))
        self.best_dice: dict[str, float] = {}
        self.history: list[dict] = []

    # ------------------------------------------------------------------
    def init_state(self, seed: int | None = None):
        seed = int(self.cfg.get("seed", 0) if seed is None else seed)
        return self.algorithm.init_state(jax.random.PRNGKey(seed))

    def _apply_pretrain(self, state):
        """Transfer a Swin-MAE pretrained encoder (config ``pretrain_ckpt``:
        the pretraining run's CheckpointManager dir) into every swin-encoder
        model in the fresh state (reference intent: sup_ACDC.py:37
        pretrain_save_path; fine-tunable SwinUnet model/swin_mae.py:440-557)."""
        ckpt_dir = self.cfg.get("pretrain_ckpt")
        if not ckpt_dir:
            return state
        import dataclasses

        from hpfg_tpu.train.algorithms.base import ModelState
        from hpfg_tpu.utils.checkpoint import CheckpointManager
        from hpfg_tpu.utils.pretrain import (extract_mae_params,
                                             transfer_mae_encoder)

        mae_params = extract_mae_params(CheckpointManager(ckpt_dir).restore(
            str(self.cfg.get("pretrain_tag", "last"))))
        updates = {}
        for f in dataclasses.fields(state):
            v = getattr(state, f.name)
            if isinstance(v, ModelState) and isinstance(v.params, dict) \
                    and "encoder" in v.params:
                new_params, report = transfer_mae_encoder(mae_params, v.params)
                if report["transferred"]:
                    updates[f.name] = v.replace(params=new_params)
                    self.logger.info(
                        "pretrain_ckpt %s -> %s: %d tensors transferred, "
                        "%d shape-skipped, %d missing", ckpt_dir, f.name,
                        len(report["transferred"]),
                        len(report["skipped_shape"]),
                        len(report["missing_target"]))
        return state.replace(**updates) if updates else state

    def resume(self, state, tag: str = "last", strict: bool = False):
        """Restore ``tag`` into ``state``. ``tag='last'`` resolves to the
        newest committed crash-recovery point (last / last_a / last_b).
        ``strict`` raises when the tag does not exist — an explicitly
        requested checkpoint silently degrading to scratch training is a
        footgun (ADVICE r2)."""
        if tag == "last":
            resolved = self.ckpt.latest_resume_tag("last")
            if resolved is not None:
                self.logger.info("resuming from checkpoint %r", resolved)
                return self.ckpt.restore(resolved, state)
        elif self.ckpt.exists(tag):
            self.logger.info("resuming from checkpoint %r", tag)
            return self.ckpt.restore(tag, state)
        if strict:
            raise FileNotFoundError(
                f"requested checkpoint {tag!r} not found under "
                f"{self.ckpt.directory}")
        return state

    # ------------------------------------------------------------------
    def _build_device_cache(self, batches, cache_n: int):
        """Stack cache_n host batches into [E, B, ...] device arrays (batch
        axis sharded, epoch axis replicated) and build the cached step:
        batch = mega[state.step % E], restored + device-augmented in-jit."""
        import jax.numpy as jnp

        from hpfg_tpu.data.prefetch import compress_wire, restore_wire_dtypes
        from hpfg_tpu.parallel.mesh import shard_cached

        host = [next(batches) for _ in range(cache_n)]
        if self.wire_compress:
            host = [compress_wire(b) for b in host]
        mega_host = {k: np.stack([b[k] for b in host]) for k in host[0]}
        mega = shard_cached(self.mesh, mega_host)
        self.logger.info(
            "device cache: %d batches, %.1f MB resident", cache_n,
            sum(v.nbytes for v in mega_host.values()) / 1e6)
        if getattr(self, "_jit_cached_n", None) == cache_n:
            return mega  # keep the already-compiled cached step

        algo_step = self.algorithm.step
        aug_rng = self._aug_rng
        device_augment = self.device_augment
        e = cache_n

        def cached_step(state, mega):
            k = jnp.mod(state.step, e)
            # dynamic_index_in_dim lowers to a dynamic-slice on the
            # REPLICATED epoch axis — jnp's v[k] with a traced k emits a
            # gather, which sends GSPMD down pathological partitioning
            # paths on the batch-sharded cache (r2: >20-min flaky compiles)
            batch = jax.tree_util.tree_map(
                lambda v: jax.lax.dynamic_index_in_dim(v, k, 0,
                                                       keepdims=False), mega)
            batch = restore_wire_dtypes(batch)
            if device_augment:
                from hpfg_tpu.ops.augment import augment_batch_dict

                batch = augment_batch_dict(
                    aug_rng, state.step.astype(jnp.uint32), batch)
            return algo_step(state, batch)

        self._jit_cached = jax.jit(cached_step, donate_argnums=(0,))
        self._jit_cached_n = cache_n
        return mega

    # ------------------------------------------------------------------
    def fit(self, state=None, eval_enabled: bool = True):
        cfg = self.cfg
        if state is None:
            state = self.init_state()
            state = self._apply_pretrain(state)
        batches = self.algorithm.batches(self.loaders)
        # device-cached epoch mode: N host batches upload ONCE; every
        # iteration indexes the cache by state.step and augments ON DEVICE —
        # zero per-iteration host→device traffic. The TPU-native answer for
        # datasets that fit HBM (one ACDC epoch ≈ 200 MB): the dev tunnel's
        # ~45 MB/s uplink (BENCH_NOTES.md) otherwise caps any host-fed loop
        # at ~200 img/s, and even on production hosts this removes the input
        # pipeline from the critical path entirely.
        cache_n = int(cfg.get("device_cache", 0))
        mega = None
        prefetcher = None
        if cache_n > 0:
            mega = self._build_device_cache(batches, cache_n)
        else:
            # double-buffered host→device pipeline: batch N+1 crosses H2D
            # while step N runs (see data/prefetch.py); prefetch: 0 disables
            prefetch_depth = int(cfg.get("prefetch", 2))
            if prefetch_depth > 0:
                from hpfg_tpu.data.prefetch import DevicePrefetcher

                prefetcher = DevicePrefetcher(batches, self.mesh,
                                              depth=prefetch_depth,
                                              compress=self.wire_compress)
                batches = prefetcher

        self.logger.info("start training %s for %d iterations",
                         self.algorithm.name, self.total_itrs)
        t_start = time.time()
        t_window = t_start  # windowed-rate anchor (VERDICT r3: cumulative
        iter_window = 0     # rates understate steady state on long runs)
        pending_metrics: list[tuple[int, Any]] = []
        cur = int(np.asarray(state.step))
        images_per_step = None
        batch = None
        # Cleanup runs even when training raises mid-run (ADVICE r4): the
        # non-daemon eval worker must be joined (else interpreter shutdown
        # blocks on it, possibly mid-checkpoint-rotation) — but a secondary
        # eval error must not mask the primary training exception.
        failed = False
        try:
            while cur < self.total_itrs:
                if mega is not None:
                    if images_per_step is None:
                        images_per_step = sum(
                            v.shape[1] for k, v in mega.items()
                            if "img" in k or k == "image")
                    state, metrics = self._jit_cached(state, mega)
                else:
                    batch = next(batches)
                    if images_per_step is None:
                        images_per_step = sum(
                            v.shape[0] for k, v in batch.items()
                            if "img" in k or k == "image")
                    if prefetcher is None:
                        batch = shard_batch(self.mesh, batch)
                    if self.device_augment:
                        self._aug_counter += 1
                        state, metrics = self._jit_step(
                            state, batch, np.uint32(self._aug_counter))
                    else:
                        state, metrics = self._jit_step(state, batch)
                cur += 1
                pending_metrics.append((cur, metrics))

                if cur % self.log_every == 0 or cur == self.total_itrs:
                    # ONE device→host transfer for the whole window:
                    # per-scalar fetches cost tens of ms each through the
                    # TPU tunnel
                    last = self._flush_metrics(pending_metrics)
                    if cur % (self.log_every * 10) == 0:
                        now = time.time()
                        rate = cur * (images_per_step or 0) / (now - t_start)
                        wrate = ((cur - iter_window) * (images_per_step or 0)
                                 / max(now - t_window, 1e-9))
                        t_window, iter_window = now, cur
                        self.logger.info(
                            "iter %d/%d loss %.4f "
                            "(%.1f img/s window, %.1f avg)",
                            cur, self.total_itrs,
                            last.get("loss", float("nan")), wrate, rate)

                if eval_enabled and cur % self.step_size == 0:
                    self._flush_metrics(pending_metrics)
                    # crash-recovery rotation rides the eval worker on the
                    # same snapshot (off the dispatch hot path)
                    self._dispatch_eval(state, cur, save_rotating=True)
                    panels_fn = getattr(self.algorithm, "image_panels", None)
                    if panels_fn is not None and batch is not None \
                            and not self._writer_disabled():
                        for tag, img in panels_fn(state, batch).items():
                            self.writer.add_image(tag, img, cur)
        except BaseException:
            failed = True
            raise
        finally:
            if prefetcher is not None:
                prefetcher.close()
            try:
                # surface any pending overlapped-eval result/error
                self._join_eval()
            except Exception:
                if not failed:
                    raise
                self.logger.exception(
                    "overlapped eval also failed during shutdown "
                    "(primary training exception follows)")
            if self._eval_pool is not None:
                self._eval_pool.shutdown(wait=True)
                self._eval_pool = None
        self.ckpt.save("last", state, block=True)  # also flushes async saves
        elapsed = time.time() - t_start
        self.logger.info("done: %d iters in %.1fs (%.2f it/s)",
                         cur, elapsed, cur / max(elapsed, 1e-9))
        return state

    # ------------------------------------------------------------------
    def _flush_metrics(self, pending: list) -> dict:
        """Write queued scalar metrics to TB with a single stacked
        device→host transfer (each individual fetch pays the full tunnel
        round-trip)."""
        if not pending:
            return {}
        names = sorted(pending[0][1].keys())
        rows = [m for _, m in pending]
        # pad to the fixed log window so every flush reuses ONE compiled
        # stacking program (pending never exceeds log_every: we flush at
        # every log boundary)
        window = max(self.log_every, len(rows))
        rows = rows + [rows[-1]] * (window - len(rows))
        table = np.asarray(_stack_metrics(rows))[:len(pending)]
        for (it, _), row in zip(pending, table):
            self.writer.add_scalars(dict(zip(names, row)), it,
                                    prefix=self.algorithm.name)
        last = dict(zip(names, table[-1]))
        pending.clear()
        return {k: float(v) for k, v in last.items()}

    # ------------------------------------------------------------------
    def _dispatch_eval(self, state, cur_itrs: int,
                       save_rotating: bool = False) -> None:
        """Run evaluate() on a snapshot, overlapped with training when
        ``async_eval`` (default on). The snapshot is a tree_copy so the
        donated train step cannot invalidate the buffers mid-eval; best-dice
        checkpoints save the snapshot (the exact evaluated params). Evals
        are serialized on one worker — a new boundary first joins the
        previous eval, so cadence can never outrun eval wall time.

        ``save_rotating`` piggybacks the crash-recovery checkpoint on the
        same snapshot INSIDE the worker: the orbax device→host gather then
        overlaps training instead of blocking the dispatch loop (~1-2 s per
        boundary through this tunnel, SUSTAINED_r04 analysis). Recovery
        semantics are unchanged — a crash resumes from the boundary iter."""
        if not self.async_eval:
            self.evaluate(state, cur_itrs)
            if save_rotating:
                self.ckpt.save_rotating(state)
            return
        from concurrent.futures import ThreadPoolExecutor

        from hpfg_tpu.train.algorithms.base import tree_copy

        if self._eval_pool is None:
            self._eval_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="hpfg-eval")
        self._join_eval()
        # one jitted Execute for the whole snapshot: eager tree_copy
        # dispatches one device op per leaf, and every Execute pays a
        # 0.6-3 ms floor through the dev tunnel (hundreds of leaves
        # ⇒ ~1 s per boundary)
        if self._jit_snapshot is None:
            import jax as _jax
            self._jit_snapshot = _jax.jit(tree_copy)
        snap = self._jit_snapshot(state)

        def task():
            out = self.evaluate(snap, cur_itrs)
            if save_rotating:
                self.ckpt.save_rotating(snap)
            return out

        self._eval_future = self._eval_pool.submit(task)

    def _join_eval(self) -> None:
        """Wait for the in-flight overlapped eval (re-raising its errors —
        a silently dead evaluator would otherwise train blind)."""
        fut, self._eval_future = self._eval_future, None
        if fut is not None:
            fut.result()

    def evaluate(self, state, cur_itrs: int) -> dict[str, tuple[float, float]]:
        results = {}
        eval_models = self.algorithm.eval_models(state)
        dsname = str(self.cfg.datasets).lower()
        if dsname in VOLUME_DATASETS:
            # models sharing an architecture (e.g. student + its EMA) are
            # evaluated together: one upload of each volume, gt-EDT shared,
            # dice accumulated on device (EVAL_COST_r05 — the per-model
            # round-trips were most of the ~1.4 s eval-boundary tax).
            # HPFG_EVAL_MULTI=0 restores the per-model path (A/B hook).
            order = 3 if "synapse" in dsname else 0
            use_multi = os.environ.get("HPFG_EVAL_MULTI", "1") == "1"
            groups: dict[int, tuple] = {}
            for name, (model, mstate) in eval_models.items():
                fwd = self._slice_forward(model)
                if use_multi:
                    groups.setdefault(id(fwd), (fwd, {}))[1][name] = \
                        eval_variables(mstate)
                else:
                    from hpfg_tpu.evals.volume import evaluate_volumes

                    dice, hd95, _pc, first = evaluate_volumes(
                        fwd, eval_variables(mstate), self.test_loader,
                        self.num_classes, self.test_crop, zoom_order=order)
                    self._log_panels(name, first, cur_itrs)
                    results[name] = (dice, hd95)
            for fwd, named in groups.values():
                res = evaluate_volumes_multi(
                    fwd, named, self.test_loader, self.num_classes,
                    self.test_crop, zoom_order=order,
                    want_first=not self._writer_disabled())
                for name, (dice, hd95, _per_class, first) in res.items():
                    self._log_panels(name, first, cur_itrs)
                    results[name] = (dice, hd95)
        else:
            for name, (model, mstate) in eval_models.items():
                fwd = self._slice_forward(model)
                dice, hd95, *_ = evaluate_images(
                    fwd, eval_variables(mstate), self.test_loader)
                results[name] = (dice, hd95)
        for name, (dice, hd95) in results.items():
            self.writer.add_scalar(f"{self.algorithm.name}/{name}_dice",
                                   dice, cur_itrs)
            self.writer.add_scalar(f"{self.algorithm.name}/{name}_hd95",
                                   hd95, cur_itrs)
            self.logger.info("iter %d %s dice %.4f hd95 %.4f",
                             cur_itrs, name, dice, hd95)
            if dice > self.best_dice.get(name, 0.0):
                self.best_dice[name] = dice
                self.ckpt.save(f"best_{name}", state)
        self.history.append({"iter": cur_itrs, "results": results})
        return results

    def _log_panels(self, name: str, first, cur_itrs: int) -> None:
        """First-volume image / prediction / ground-truth palette panels
        (reference: main.py:309-325, val.py:170-185)."""
        if first is None or self._writer_disabled():
            return
        image, label, pred = first
        dataset = getattr(self.test_loader, "source", None)
        to_img = getattr(dataset, "label_to_img", None)
        if to_img is None:
            return
        mid = image.shape[0] // 2
        img = image[mid]
        img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
        self.writer.add_image(f"{name}/Image",
                              (img[..., None] * 255).astype(np.uint8),
                              cur_itrs)
        self.writer.add_image(f"{name}/label_pred", to_img(pred[mid]),
                              cur_itrs)
        self.writer.add_image(f"{name}/label_true", to_img(label[mid]),
                              cur_itrs)

    def _writer_disabled(self) -> bool:
        return getattr(self.writer, "_writer", None) is None

    def _slice_forward(self, model) -> SliceForward:
        if not hasattr(self, "_fwd_cache"):
            self._fwd_cache = {}
        key = id(model)
        if key not in self._fwd_cache:
            def apply_fn(variables, x):
                if hasattr(model, "val"):
                    return model.apply(variables, x, method=model.val)
                return model.apply(variables, x, train=False)

            # eval wire precision follows the train-side wire_compress flag:
            # f16 halves H2D (free: models cast inputs to compute dtype as
            # their first op), but fp32-parity runs can opt out via config
            import numpy as _np

            self._fwd_cache[key] = SliceForward(
                apply_fn, mesh=self.mesh,
                wire_dtype=_np.float16 if self.wire_compress else _np.float32)
        return self._fwd_cache[key]
