"""Training driver for halo-sharded whole-mesh training (multi-chip).

Completes the reference's single entry point (code/train_dual.py:100) for
the halo parallel mode: `Config.halo_parts > 1` routes `train()` here
instead of the replicated-node Trainer.  Each training sample is ONE whole
mesh, node-partitioned over the "gp" mesh axis with per-conv halo exchange
(parallel/halo_model.py); the optimizer trajectory is bit-comparable to
single-device full-batch training on the same hierarchies
(tests/test_halo_train.py), and this module adds the epoch loop, eval
pass, LR schedules (incl. plateau), best/last checkpoints, metrics stream,
and auto-resume — the same driver surface as train.trainer.Trainer.

Shape notes: each distinct mesh size compiles its own step (halo samples
are padded per-partition with `granularity`; same-size meshes share).  The
halo regime is few LARGE meshes, so this is the right trade.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import numpy as np

from geobignn_tpu.config import Config
from geobignn_tpu.train import checkpoint as ckpt
from geobignn_tpu.train import optim
from geobignn_tpu.train.logging import MetricLogger


class HaloTrainer:
    """Epoch-driven trainer over halo-sharded mesh pairs.

    mesh_pairs / eval_pairs: [(TriMesh noisy, TriMesh original)]."""

    # measured surface-to-volume knee: faces/partition at which the
    # modeled no-overlap halo efficiency falls through ~80% (20480 faces
    # / 8 parts -> 76.0% against the round-5 5.98 ms single-chip step;
    # 86.3% at 4 parts — docs/halo_scaling.json)
    KNEE_FACES_PER_PART = 2560

    def __init__(self, cfg: Config, mesh_pairs, eval_pairs=None,
                 run_dir: str | None = None):
        import optax  # noqa: F401  (tx built via optim)

        from geobignn_tpu.data.builder import build_dual_sample
        from geobignn_tpu.models import DualGNN
        from geobignn_tpu.parallel import halo_train as ht
        from geobignn_tpu.parallel.api import make_mesh

        if cfg.halo_parts < 2:
            raise ValueError("HaloTrainer needs cfg.halo_parts >= 2")
        cfg.validate()
        self.cfg = cfg
        self.run_dir = run_dir
        self.n_parts = cfg.halo_parts
        self.mesh = make_mesh(1, self.n_parts)

        # halo builds run their own per-partition ordering; whole-mesh RCM
        # would be redone anyway
        bc = dataclasses.replace(cfg.build_config(), reorder=False)

        def build(m_n, m_o):
            # cfg.granularity (not the builder default 8): similar-size
            # meshes then share a compiled step (per-shape Pallas compiles
            # cost minutes on the tunneled TPU)
            return ht.build_halo_train_sample(
                m_n, m_o, bc, self.n_parts, seed=cfg.preprocess_seed,
                granularity=cfg.granularity, banded=cfg.halo_banded,
            )

        # surface-to-volume knee (docs/halo_scaling.json, measured): at
        # ~2560 faces/part the modeled no-overlap efficiency is 79.8%
        # and it drops to 66% at half that — splitting a small mesh many
        # ways trades compute for boundary exchange.  Warn, don't fail:
        # the run is still correct, just inefficient.
        min_fpp = min(m_n.n_faces for m_n, _ in mesh_pairs) // self.n_parts
        if min_fpp < self.KNEE_FACES_PER_PART:
            print(
                f"WARNING: halo_parts={self.n_parts} leaves only "
                f"{min_fpp} faces/partition on the smallest mesh — below "
                f"the measured surface-to-volume knee "
                f"(~{self.KNEE_FACES_PER_PART} faces/part ~= 80% modeled "
                "efficiency, docs/halo_scaling.json); use fewer "
                "partitions or larger meshes"
            )

        self.samples = [build(m_n, m_o) for m_n, m_o in mesh_pairs]
        self.eval_samples = [build(m_n, m_o) for m_n, m_o in (eval_pairs or [])]

        # params come from the standard flax model on a single-device build
        # of the first mesh (identical parameter pytree; halo_dual_gnn
        # consumes the inner "params" dict)
        import jax.numpy as jnp

        self._compute_dtype = (
            jnp.bfloat16 if cfg.precision == "bfloat16" else None
        )
        m0_n, m0_o = mesh_pairs[0]
        init_sample, _ = build_dual_sample(m0_n, m0_o, bc)
        model = DualGNN(force_depth=cfg.force_depth, pool_type=cfg.pool_type,
                        heads=cfg.heads)
        key = jax.random.PRNGKey(cfg.seed or 0)
        self.params = jax.tree.map(
            np.asarray, model.init(key, init_sample)["params"]
        )
        self.tx = optim.make_optimizer(cfg)
        self.opt_state = self.tx.init(self.params)
        self.epoch = 0
        self.best_error = float("inf")
        self._restored_plateau = None

        self._ht = ht
        self._steps: dict = {}  # shape-signature -> compiled step
        self._fwds: dict = {}
        self._device_arrays = [self._put(s.arrays) for s in self.samples]
        self._eval_arrays = [self._put(s.arrays) for s in self.eval_samples]

    # ------------------------------------------------------------------
    def _put(self, arrays):
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P("gp"))
        return jax.tree.map(lambda a: jax.device_put(a, sh), arrays)

    def _step_for(self, sample, arrays):
        # static exchange rounds are baked into the compiled program, so
        # same-shape samples with different schedules must not share a step
        key = (
            tuple(leaf.shape for leaf in jax.tree_util.tree_leaves(arrays)),
            repr(sample.static),
        )
        if key not in self._steps:
            cfg = self.cfg
            self._steps[key] = self._ht.make_halo_train_step(
                self.tx, self.mesh, sample.arrays,
                static_d=sample.static,
                loss_cfg=cfg.loss_cfg(),
                pool_type=cfg.pool_type,
                augment=cfg.augment,
                n_steps=1,
                compute_dtype=self._compute_dtype,
            )
        return self._steps[key]

    def _fwd_for(self, sample, arrays):
        key = (
            tuple(leaf.shape for leaf in jax.tree_util.tree_leaves(arrays)),
            repr(sample.static),
        )
        if key not in self._fwds:
            self._fwds[key] = self._ht.make_halo_forward(
                self.mesh, sample.arrays, static_d=sample.static,
                pool_type=self.cfg.pool_type,
                compute_dtype=self._compute_dtype,
            )
        return self._fwds[key]

    # ------------------------------------------------------------------
    def run_epoch(self, rng: np.random.Generator,
                  logger: MetricLogger | None = None):
        order = rng.permutation(len(self.samples))
        agg, n, msgs_done = {}, 0, 0
        t0 = time.time()
        for i in order:
            s, a = self.samples[int(i)], self._device_arrays[int(i)]
            step = self._step_for(s, a)
            key = jax.random.PRNGKey(int(rng.integers(1 << 31)))
            self.params, self.opt_state, metrics = step(
                self.params, self.opt_state, a, key
            )
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            n += 1
            msgs_done += int(s.meta.get("messages", 0))
        agg = {k: v / max(n, 1) for k, v in agg.items()}
        dt = max(time.time() - t0, 1e-9)
        agg["samples_per_s"] = n / dt
        if msgs_done:  # real (unpadded) conv messages -> the edges/s metric
            agg["edges_per_s"] = msgs_done / dt
            agg["edges_per_s_chip"] = msgs_done / dt / self.n_parts
        if logger:
            logger.log("train", self.epoch, **agg)
        return agg

    def evaluate(self, logger: MetricLogger | None = None):
        """Node-weighted eval over the halo-sharded eval meshes: sharded
        forward, host-side unshard, reference metrics on the raw graphs."""
        if not self.eval_samples:
            return None
        from geobignn_tpu.parallel import partition as hp

        sums = dict(loss_v=0.0, loss_f=0.0, error_v=0.0, error_f=0.0,
                    n_v=0.0, n_f=0.0)
        for s, a in zip(self.eval_samples, self._eval_arrays):
            fwd = self._fwd_for(s, a)
            v_loc, n_loc = fwd(self.params, a)
            vp, nf = self._ht.unshard_predictions(s, v_loc, n_loc)
            # targets travel sharded (arrays["yv"/"yf"]); unshard like the
            # predictions for host-side reference metrics
            yv = hp.unshard_features(
                np.asarray(jax.device_get(a["yv"])),
                s.structure.v.levels[0], s.n_v,
            )
            ynf = hp.unshard_features(
                np.asarray(jax.device_get(a["yf"])),
                s.structure.f.levels[0], s.n_f,
            )
            dv = vp - yv
            dn = nf - ynf
            # same loss family the halo step optimizes, evaluated through
            # the SINGLE-CHIP reference implementations on the unsharded
            # predictions (doubles as a cross-check of the sharded loss)
            import jax.numpy as jnp

            from geobignn_tpu.models import losses

            if self.cfg.loss_v == "CD":
                ones_v = jnp.ones(vp.shape[0])
                sums["loss_v"] += float(losses.loss_v(
                    jnp.asarray(vp), jnp.asarray(yv), ones_v, "CD"
                )) * vp.shape[0]
            else:
                lv = np.abs(dv) if self.cfg.loss_v == "L1" else dv**2
                sums["loss_v"] += float(lv.sum())
            if self.cfg.loss_n == "sided":
                fv = s.meta["fv_indices"]
                fc_p = vp[fv].mean(axis=1)
                fc = yv[fv].mean(axis=1)
                ones_f = jnp.ones(nf.shape[0])
                sums["loss_f"] += float(losses.loss_n(
                    jnp.asarray(nf), jnp.asarray(ynf), ones_f, "sided",
                    jnp.asarray(fc_p), jnp.asarray(fc),
                )) * nf.shape[0]
            else:
                ln = np.abs(dn) if self.cfg.loss_n == "L1" else dn**2
                sums["loss_f"] += float(ln.sum())
            sums["error_v"] += float(np.sqrt((dv**2).sum(1)).sum())
            en = np.degrees(
                np.arccos(np.clip(1.0 - (dn**2).sum(1) / 2.0, -1, 1))
            )
            sums["error_f"] += float(en.sum())
            sums["n_v"] += s.n_v
            sums["n_f"] += s.n_f
        cv, cf = max(sums["n_v"], 1.0), max(sums["n_f"], 1.0)
        out = dict(
            loss_v=sums["loss_v"] / cv, error_v=sums["error_v"] / cv,
            loss_f=sums["loss_f"] / cf, error_f=sums["error_f"] / cf,
        )
        if logger:
            logger.log("test", self.epoch, **out)
        return out

    # ------------------------------------------------------------------
    def fit(self, logger: MetricLogger | None = None, on_epoch=None) -> float:
        cfg = self.cfg
        plateau = (
            optim.PlateauState(cfg.lr, cfg.lr_decay, cfg.lr_step[0])
            if cfg.lr_sch == "auto" else None
        )
        if plateau is not None and self._restored_plateau:
            for k, v in self._restored_plateau.items():
                setattr(plateau, k, v)
        last_lr = plateau.lr if plateau is not None else cfg.lr
        for self.epoch in range(self.epoch, cfg.max_epoch):
            if plateau is None:
                last_lr = optim.lr_at_epoch(cfg, self.epoch)
            self.opt_state = optim.set_lr(self.opt_state, last_lr)

            # epoch-keyed rng: resume replays the exact shuffle/augment
            # stream of an uninterrupted run (see Trainer.fit)
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
                        self.params, epoch=self.epoch,
                        best_error=self.best_error,
                    )
            if self.run_dir:
                ckpt.save_checkpoint(
                    os.path.join(self.run_dir, "ckpt_last.pkl"),
                    self.params, self.opt_state, epoch=self.epoch,
                    best_error=self.best_error,
                    plateau=None if plateau is None
                    else dataclasses.asdict(plateau),
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
