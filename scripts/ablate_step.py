"""Component-level timing of the EBEN GAN train step on the real TPU.

Methodology: every timed function is chained through a true data dependency
(x_{i+1} = f(x_i) or params_{i+1} = params - eps * grads) with ONE device
sync at the end — per-call scalar readback adds a ~30 ms tunnel round-trip
on this backend and poisoned the round-1 ablations.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_step.py
"""

from __future__ import annotations

import time


def main() -> None:
    from vibravox_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vibravox_tpu.losses.gan import FeatureMatchingLoss, HingeLoss
    from vibravox_tpu.models.eben_discriminator import DiscriminatorEBENMultiScales
    from vibravox_tpu.models.eben_generator import EBENGenerator
    from vibravox_tpu.ops.stft import MultiResolutionSTFTLoss
    from vibravox_tpu.tasks.eben import EBENTask
    from vibravox_tpu.tasks.eben_oracle import balancing_lambdas_naive

    print("devices:", jax.devices(), flush=True)
    sample_rate, batch_size, seconds = 16000, 32, 2.5
    task = EBENTask(
        sample_rate=sample_rate,
        generator=EBENGenerator(m=4, n=32, p=2),
        discriminator=DiscriminatorEBENMultiScales(q=4, min_channels=24),
        generator_optimizer=optax.adam(3e-4, b1=0.5, b2=0.9),
        discriminator_optimizer=optax.adam(3e-4, b1=0.5, b2=0.9),
        reconstructive_loss_freq_fn=MultiResolutionSTFTLoss(
            (512, 1024, 2048), (50, 120, 240), (240, 600, 1200),
            sample_rate=sample_rate, perceptual_weighting=True,
        ),
        feature_matching_loss_fn=FeatureMatchingLoss(),
        adversarial_loss_fn=HingeLoss(),
        dynamic_loss_balancing="ema",
        compute_dtype="bfloat16",
    )
    t_samples = task.generator.valid_length(int(seconds * sample_rate))
    rng = np.random.default_rng(0)
    batch = {
        "audio_body_conducted": jnp.asarray(
            rng.standard_normal((batch_size, t_samples, 1)).astype(np.float32) * 0.1
        ),
        "audio_airborne": jnp.asarray(
            rng.standard_normal((batch_size, t_samples, 1)).astype(np.float32) * 0.1
        ),
    }
    state = task.init_state(jax.random.key(0), batch)
    state = jax.jit(lambda s: s)(state)

    dtype = jnp.bfloat16
    corrupted = task.generator.cut_to_valid_length(batch["audio_body_conducted"]).astype(dtype)
    reference = task.generator.cut_to_valid_length(batch["audio_airborne"]).astype(dtype)
    decomposed_reference = task.generator.pqmf.analysis(reference)

    def timeit(name, f, x0, n=20):
        f = jax.jit(f)
        x = f(x0)
        jax.block_until_ready(x)
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = f(x)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:40s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    # 1) generator forward (chained on audio)
    def gen_fwd(x):
        enhanced, _ = task.generator.apply(state.gen_params, x)
        return enhanced.astype(dtype)

    timeit("gen fwd", gen_fwd, corrupted)

    # 2) discriminator forward on both signals
    def disc_fwd(x):
        dec = task.generator.pqmf.analysis(x)
        emb = task.discriminator.apply(state.disc_params, dec, x)
        return x + 1e-30 * emb[0][-1].astype(x.dtype).sum()

    timeit("disc fwd (1 signal)", disc_fwd, corrupted)

    # 3) generator grad, full loss (chained on params)
    lambdas = jnp.ones((len(task.atomic_loss_names),))

    def gen_grad_step(gen_params):
        def loss_fn(gp):
            enhanced, decomposed = task.generator.apply(gp, corrupted)
            atomic = task._generator_atomic_losses(
                state.disc_params, enhanced, reference, decomposed, decomposed_reference
            )
            return jnp.sum(lambdas * jnp.stack([atomic[k] for k in task.atomic_loss_names]))

        grads = jax.grad(loss_fn)(gen_params)
        return jax.tree_util.tree_map(lambda p, g: p - 1e-9 * g, gen_params, grads)

    timeit("gen grad (full loss)", gen_grad_step, state.gen_params)

    # 3b) generator grad, mstft-only loss
    def gen_grad_mstft(gen_params):
        def loss_fn(gp):
            enhanced, _ = task.generator.apply(gp, corrupted)
            return task.reconstructive_loss_freq_fn(enhanced, reference)

        grads = jax.grad(loss_fn)(gen_params)
        return jax.tree_util.tree_map(lambda p, g: p - 1e-9 * g, gen_params, grads)

    timeit("gen grad (mstft only)", gen_grad_mstft, state.gen_params)

    # 4) balancing jacrev (chained on last kernel through full tail)
    features, first_bands = task.generator.apply(state.gen_params, corrupted, method="front")

    def balance_step(gen_params):
        st = state.replace(gen_params=gen_params)
        lam, _ = balancing_lambdas_naive(task, st, features, first_bands, reference, decomposed_reference)
        return jax.tree_util.tree_map(
            lambda p: p - 1e-30 * lam.sum().astype(p.dtype), gen_params
        )

    timeit("balancing jacrev", balance_step, state.gen_params)

    # 5) discriminator grad
    enhanced, decomposed = task.generator.apply(state.gen_params, corrupted)

    def disc_grad_step(disc_params):
        def loss_fn(dp):
            atomic = task._discriminator_atomic_losses(
                dp, enhanced, reference, decomposed, decomposed_reference
            )
            return atomic["real_loss"] + atomic["fake_loss"]

        grads = jax.grad(loss_fn)(disc_params)
        return jax.tree_util.tree_map(lambda p, g: p - 1e-9 * g, disc_params, grads)

    timeit("disc grad", disc_grad_step, state.disc_params)

    # 6) both adam updates (chained on state)
    def adam_step(st):
        g_upd, g_opt = task.generator_optimizer.update(
            jax.tree_util.tree_map(jnp.ones_like, st.gen_params), st.gen_opt_state, st.gen_params
        )
        d_upd, d_opt = task.discriminator_optimizer.update(
            jax.tree_util.tree_map(jnp.ones_like, st.disc_params), st.disc_opt_state, st.disc_params
        )
        return st.replace(
            gen_params=optax.apply_updates(st.gen_params, g_upd),
            disc_params=optax.apply_updates(st.disc_params, d_upd),
            gen_opt_state=g_opt,
            disc_opt_state=d_opt,
        )

    timeit("adam updates (both)", adam_step, state)

    # 7) full train step
    def full_step(st):
        st, _ = task.train_step(st, batch)
        return st

    timeit("FULL train step", full_step, state, n=20)


if __name__ == "__main__":
    main()
