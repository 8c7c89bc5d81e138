"""Latent ODE on irregularly-sampled spirals.

Capability parity with upstream `examples/latent_ode.py` (SURVEY.md §2,
§3.5): generate noisy clockwise/counter-clockwise spirals sampled at
irregular time points; encode backward with `RecognitionRNN` to q(z0);
reparameterize-sample z0; decode the latent trajectory with dopri5 through
`LatentODEFunc`; train all three nets jointly on the ELBO with Adam.

TPU-native: the full epoch (encode -> sample -> solve -> ELBO -> grads ->
update) is ONE jitted XLA program over the whole batch of spirals.
This file doubles as the benchmark workload for `bench.py`
("latent-ODE epoch wall-clock", BASELINE.md).
"""

from __future__ import annotations

import argparse
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # run as a script from anywhere
from tfdiffeq_tpu import odeint
from tfdiffeq_tpu.models.latent_ode import (Decoder, LatentODEFunc,
                                            RecognitionRNN, log_normal_pdf,
                                            normal_kl)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--niters", type=int, default=2000)
    p.add_argument("--nspiral", type=int, default=1000)
    p.add_argument("--ntimes", type=int, default=500)
    p.add_argument("--nsample", type=int, default=100)
    p.add_argument("--latent_dim", type=int, default=4)
    p.add_argument("--nhidden", type=int, default=20)
    p.add_argument("--rnn_nhidden", type=int, default=25)
    p.add_argument("--obs_dim", type=int, default=2)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--noise_std", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train_dir", default="",
                   help="Orbax checkpoint dir; resumes from the newest "
                        "checkpoint when one exists")
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--fused", action="store_true",
                   help="decode with the fully-fused Pallas training path "
                        "(one whole-solve kernel forward, one adjoint-"
                        "sweep kernel backward) instead of the generic "
                        "differentiable loop")
    p.add_argument("--dp", action="store_true",
                   help="data-parallel training over ALL visible devices: "
                        "batch sharded on a 1-D mesh, params replicated; "
                        "XLA inserts the gradient psum over ICI")
    return p.parse_args(argv)


def generate_spirals(nspiral=1000, ntotal=500, nsample=100, start=0.0,
                     stop=6 * np.pi, noise_std=0.3, a=0.0, b=0.3, seed=0):
    """Two-class (cw/ccw) Archimedean-like spirals, irregularly subsampled
    (reference `generate_spiral2d`). Returns:
      orig_trajs [N, ntotal, 2], samp_trajs [N, nsample, 2],
      orig_ts [ntotal], samp_ts [nsample].
    """
    rng = np.random.RandomState(seed)
    orig_ts = np.linspace(start, stop, ntotal)
    samp_idx = np.sort(rng.choice(ntotal // 2, nsample, replace=False))
    samp_ts = orig_ts[samp_idx]

    # counter-clockwise spiral: r = a + b * t
    zs_cc = stop + 1.0 - orig_ts
    # Hyperbolic-like radius at the same scale as the cw spiral (the
    # upstream example uses a + b*50/zs); a sub-noise-std radius would make
    # the ccw class indistinguishable from observation noise.
    rs_cc = a + b * 50.0 / (zs_cc + 2.0)
    xs_cc, ys_cc = rs_cc * np.cos(zs_cc) - 5.0, rs_cc * np.sin(zs_cc)
    cc_traj = np.stack([xs_cc, ys_cc], axis=1)

    # clockwise spiral
    zs_cw = orig_ts
    rw_cw = a + b * zs_cw
    xs_cw, ys_cw = rw_cw * np.cos(zs_cw) + 5.0, rw_cw * np.sin(zs_cw)
    cw_traj = np.stack([xs_cw, ys_cw], axis=1)

    orig_trajs, samp_trajs = [], []
    for _ in range(nspiral):
        t0_idx = rng.randint(0, ntotal // 2)
        cc = bool(rng.rand() > 0.5)
        base = cc_traj if cc else cw_traj
        traj = base.copy()
        orig_trajs.append(traj)
        samp = traj[np.clip(samp_idx + t0_idx, 0, ntotal - 1)]
        samp = samp + rng.randn(*samp.shape) * noise_std
        samp_trajs.append(samp)

    return (np.stack(orig_trajs), np.stack(samp_trajs),
            orig_ts, samp_ts)


class TrainState(NamedTuple):
    params: dict
    opt_state: object


def build_model(args):
    rec = RecognitionRNN(latent_dim=args.latent_dim, obs_dim=args.obs_dim,
                         hidden=args.rnn_nhidden)
    dyn = LatentODEFunc(latent_dim=args.latent_dim, hidden=args.nhidden)
    dec = Decoder(obs_dim=args.obs_dim, hidden=args.nhidden)
    return rec, dyn, dec


def init_params(args, rec, dyn, dec, key):
    k1, k2, k3 = jax.random.split(key, 3)
    # Explicit f32: under jax_enable_x64 the default dtype is f64, which
    # would initialize f64 params that mismatch the f32 training data.
    xs = jnp.ones((1, args.nsample, args.obs_dim), jnp.float32)
    z = jnp.ones((1, args.latent_dim), jnp.float32)
    return {
        "rec": rec.init(k1, xs),
        "dyn": dyn.init(k2, 0.0, z),
        "dec": dec.init(k3, z),
    }


def make_train_step(args, rec, dyn, dec, opt, samp_ts):
    noise_std = args.noise_std
    fused = bool(getattr(args, "fused", False))

    def loss_fn(params, xs, key):
        # encode backward in time
        qz0_mean, qz0_logvar = rec.apply(params["rec"], xs)
        eps = jax.random.normal(key, qz0_mean.shape, qz0_mean.dtype)
        z0 = qz0_mean + eps * jnp.exp(0.5 * qz0_logvar)

        if fused:
            # Fully-fused Pallas training path: the ELU-MLP latent dynamics
            # run as ONE whole-solve kernel forward and ONE adjoint-sweep
            # kernel backward (tfdiffeq_tpu.fast).
            from tfdiffeq_tpu.fast import (MLPSpec, odeint_adjoint_mlp,
                                           weights_from_flax_dense)
            weights = weights_from_flax_dense(params["dyn"])
            pred_z = odeint_adjoint_mlp(
                MLPSpec(activation="elu"), weights, z0, samp_ts,
                rtol=1e-4, atol=1e-6)
            pred_z = jnp.swapaxes(pred_z, 0, 1)        # [B, T, latent]
            pred_x = dec.apply(params["dec"], pred_z)   # [B, T, obs]
            logvar_obs = jnp.log(jnp.asarray(noise_std ** 2, pred_x.dtype))
            logpx = jnp.sum(
                log_normal_pdf(xs, pred_x,
                               jnp.full_like(pred_x, logvar_obs)),
                axis=(-2, -1))
            kl = jnp.sum(normal_kl(qz0_mean, qz0_logvar,
                                   jnp.zeros_like(qz0_mean),
                                   jnp.zeros_like(qz0_logvar)), axis=-1)
            return -jnp.mean(logpx - kl)

        # decode latent trajectory with dopri5 (on-device loop)
        def f(t, z):
            return dyn.apply(params["dyn"], t, z)

        pred_z = odeint(f, z0, samp_ts, method="dopri5", rtol=1e-4,
                        atol=1e-6, options={"max_steps": 256,
                                            "chunk_size": 16})
        pred_z = jnp.swapaxes(pred_z, 0, 1)            # [B, T, latent]
        pred_x = dec.apply(params["dec"], pred_z)       # [B, T, obs]

        # ELBO
        logvar_obs = jnp.log(jnp.asarray(noise_std ** 2, pred_x.dtype))
        logpx = jnp.sum(log_normal_pdf(xs, pred_x,
                                       jnp.full_like(pred_x, logvar_obs)),
                        axis=(-2, -1))
        kl = jnp.sum(normal_kl(qz0_mean, qz0_logvar,
                               jnp.zeros_like(qz0_mean),
                               jnp.zeros_like(qz0_logvar)), axis=-1)
        return -jnp.mean(logpx - kl)

    @jax.jit
    def train_step(state: TrainState, xs, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, xs, key)
        updates, opt_state = opt.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), loss

    return train_step, loss_fn


def main(argv=None):
    args = parse_args(argv)
    key = jax.random.PRNGKey(args.seed)

    _, samp_trajs, _, samp_ts = generate_spirals(
        nspiral=args.nspiral, ntotal=args.ntimes, nsample=args.nsample,
        noise_std=args.noise_std, seed=args.seed)
    xs = jnp.asarray(samp_trajs, jnp.float32)
    samp_ts = jnp.asarray(samp_ts, jnp.float32)

    rec, dyn, dec = build_model(args)
    key, sub = jax.random.split(key)
    params = init_params(args, rec, dyn, dec, sub)
    opt = optax.adam(args.lr)
    state = TrainState(params, opt.init(params))

    # Checkpoint/resume (Orbax): restore the full training state from the
    # newest checkpoint in --train_dir if one exists.
    mngr = None
    start_iter = 0
    if args.train_dir:
        import ckpt
        mngr = ckpt.make_manager(args.train_dir)
        step, restored = ckpt.restore_latest(
            mngr, {"params": state.params, "opt_state": state.opt_state})
        if step is not None:
            state = TrainState(restored["params"], restored["opt_state"])
            start_iter = step
            key = jax.random.fold_in(key, step)
            print(f"resumed from {args.train_dir} at iter {step}")

    if args.dp:
        # Data-parallel scale-out: batch axis sharded over every device,
        # parameters/optimizer state replicated. The jitted train step then
        # runs sharded end-to-end (solver arithmetic included) with XLA
        # inserting the gradient all-reduce over ICI.
        from tfdiffeq_tpu.parallel.sharding import (make_mesh, replicate,
                                                    shard_batch)
        mesh = make_mesh(axis_names=("data",))
        if xs.shape[0] % mesh.shape["data"]:
            raise SystemExit(f"--dp needs nspiral divisible by the device "
                             f"count {mesh.shape['data']}")
        xs = shard_batch(xs, mesh)
        state = TrainState(replicate(state.params, mesh),
                           replicate(state.opt_state, mesh))
        print(f"data-parallel over {mesh.shape['data']} device(s)")

    train_step, _ = make_train_step(args, rec, dyn, dec, opt, samp_ts)

    start = time.time()
    n_done = 0
    for itr in range(start_iter + 1, args.niters + 1):
        key, sub = jax.random.split(key)
        state, loss = train_step(state, xs, sub)
        n_done += 1
        if itr == start_iter + 1 or itr % 20 == 0 or itr == args.niters:
            print(f"Iter {itr:04d} | -ELBO {float(loss):.4f} | "
                  f"{(time.time() - start) / n_done * 1000:.1f} ms/it")
        if mngr is not None and (itr % args.save_every == 0
                                 or itr == args.niters):
            import ckpt
            ckpt.save(mngr, itr, {"params": state.params,
                                  "opt_state": state.opt_state})

    if mngr is not None:
        import ckpt
        ckpt.finish(mngr)
    print(f"done: {n_done} iters in {time.time() - start:.1f}s")
    return state


if __name__ == "__main__":
    main()
