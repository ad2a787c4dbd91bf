"""Benchmark harness. Prints ONE JSON line to stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: VGAN_no_kl train-step throughput on the reference demo
config (n=2000, d=10, batch_size=500 -> 4 steps/epoch), measured steady-state
on the whole-fit XLA program. The baseline denominator is the reference
PyTorch implementation on CPU, measured on this machine (see BASELINE.md):
11.28 steps/s for VGAN_no_kl (the same config; /root/reference/src/vgan.py
run 2026-08-16, torch 2.x CPU, float32 input).

Secondary metrics (stderr, recorded for tracking): fused Pallas MMD Gram
TFLOP/s at the d>=10k stress config, and subspaces sampled/sec.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_CPU_NO_KL_STEPS_PER_SEC = 11.28  # measured; see module docstring


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vgan_tpu.train.steps import TrainConfig, no_kl_fit_program

    log(f"devices: {jax.devices()}")

    rng = np.random.default_rng(0)
    cov = np.eye(10)
    for i, j in [(0, 8), (0, 9), (8, 9)]:
        cov[i, j] = cov[j, i] = 0.95
    x = jnp.asarray(
        rng.multivariate_normal(np.zeros(10), cov, size=2000).astype(np.float32)
    )

    # Methodology note: on tunneled TPUs both dispatch and block_until_ready
    # exhibit RPC jitter from ~1ms to ~900ms, so short runs are unmeasurable.
    # We time ONE large compiled program (5000 epochs = 20000 steps) from
    # dispatch through an actual value fetch — compute dominates the RPC
    # overheads and the number is a conservative end-to-end throughput.
    epochs = 5000  # 4 steps each
    config = TrainConfig(ndims=10, batch_size=500, lr_g=0.001, mmd_impl="auto")
    key = jax.random.PRNGKey(777)

    # Compile-service congestion probe. Round 2 recorded a 745 s
    # "compile+first run" for this same program (BENCH_r02) vs 10.9 s in
    # round 1 with an UNCHANGED steady-state; the terminal compile service
    # has load spikes (the same trivial jit cold-compiles in 0.5 s or 87 s
    # depending on ambient load — see docs/KERNELS.md "Measurement
    # methodology"). A slow probe means ambient congestion, not program
    # growth; compile, first run, and steady-state are timed separately
    # below so the three can never be conflated again.
    probe_rows = 200 + int(time.time()) % 64  # fresh shape: defeats the
    probe = jax.jit(lambda a: (a @ a.T).sum())  # cross-process compile cache
    pa = jnp.ones((probe_rows, 129))
    t0 = time.time()
    float(probe(pa))
    log(f"compile-service probe (trivial jit, cold): {time.time() - t0:.1f}s "
        "(>5s = ambient compile congestion)")

    t0 = time.time()
    lowered = no_kl_fit_program.lower(x, key, config, epochs)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    t0 = time.time()
    state, losses = compiled(x, key)
    final = float(losses[-1])
    log(f"trace+lower: {t_lower:.1f}s  compile: {t_compile:.1f}s  "
        f"first run+fetch: {time.time() - t0:.1f}s (final loss {final:.3f})")
    log("note: at d=10 the auto dispatch runs the XLA-fused jnp Gram (the "
        "Pallas kernels engage at d >= 512 or m >= 4096; their numbers are "
        "the Gram line below and examples/tpu_kernel_parity.py)")

    # Jitter-robust headline (round-4 finding: median-of-3 let two bad
    # host-RPC runs set BENCH_r04's record 43% below the true chip rate —
    # runs 1.70/0.53/0.92 s for an unchanged program). The tunnel's jitter
    # is purely ADDITIVE host/RPC overhead on top of a deterministic
    # compiled program, so min over >=5 runs is the honest estimate of the
    # chip time; median and the per-run list are reported alongside, and a
    # jitter flag fires when spread exceeds 1.5x so the snapshot
    # self-diagnoses (docs/KERNELS.md "Measurement methodology").
    times = []
    for r in range(5):
        t0 = time.time()
        state, losses = compiled(x, jax.random.fold_in(key, r))
        float(losses[-1])  # real completion barrier (value fetch)
        times.append(time.time() - t0)
    dt_min = float(np.min(times))
    dt_med = float(np.median(times))
    steps = epochs * (x.shape[0] // config.batch_size)
    steps_per_sec = steps / dt_min
    jitter = dt_med / dt_min if dt_min > 0 else 1.0
    spread = max(times) / dt_min if dt_min > 0 else 1.0
    log(f"train: {steps} steps in min {dt_min:.3f}s / median {dt_med:.3f}s "
        f"(runs: {', '.join(f'{t:.2f}' for t in times)}) -> "
        f"{steps_per_sec:.0f} steps/s (min-based; median-based: "
        f"{steps/dt_med:.0f})")
    if spread > 1.5:
        log(f"JITTER FLAG: run spread {spread:.1f}x (max/min) exceeds 1.5x "
            f"-> ambient host/tunnel RPC noise present; the min-based "
            f"headline is the chip rate, the median reflects the noise")

    # --- secondary: kl (adversarial) variant throughput ---------------------
    try:
        from vgan_tpu.train.steps import AlternationSchedule, kl_fit_program

        kl_epochs = 2000
        kl_config = TrainConfig(ndims=10, batch_size=500, mmd_impl="auto")
        phases = jnp.asarray(AlternationSchedule(1, 5).phase_array(kl_epochs))
        t0 = time.time()
        kl_compiled = kl_fit_program.lower(
            x, jax.random.PRNGKey(7), phases, kl_config
        ).compile()
        t_kl_compile = time.time() - t0
        t0 = time.time()
        _, det_hist, _ = kl_compiled(x, jax.random.PRNGKey(7), phases)
        float(det_hist[-1])
        log(f"kl trace+compile: {t_kl_compile:.1f}s  "
            f"first run+fetch: {time.time() - t0:.1f}s")
        t_kl = []
        for r in range(3):
            t0 = time.time()
            _, det_hist, _ = kl_compiled(x, jax.random.PRNGKey(8 + r), phases)
            float(det_hist[-1])
            t_kl.append(time.time() - t0)
        dt_kl = float(np.min(t_kl))
        kl_steps = kl_epochs * (x.shape[0] // kl_config.batch_size)
        log(f"kl train: {kl_steps} steps in min {dt_kl:.3f}s (runs: "
            f"{', '.join(f'{t:.2f}' for t in t_kl)}) -> "
            f"{kl_steps/dt_kl:.0f} steps/s (ref CPU: 18.7)")
    except Exception as e:  # pragma: no cover
        log(f"kl bench skipped: {e}")

    # --- secondary: fused MMD Gram TFLOP/s at the stress config -------------
    try:
        from vgan_tpu.ops.mmd import mmd_loss_constrained_stateful

        n, d = 500, 10240
        xs = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        u = jnp.asarray(rng.uniform(size=(n, d)).astype(np.float32))

        # The axon tunnel adds ~20 ms of dispatch+fetch overhead per program
        # call; at ~1 ms/step that must amortize over hundreds of in-program
        # iterations or it inflates the per-step number ~2x (round-2 finding:
        # 20 iters read 2.09 ms/step for a 1.04 ms loss).
        iters = 200
        @jax.jit
        def loss_grad_many(xs, u):
            def f(u_):
                loss, _ = mmd_loss_constrained_stateful(
                    xs, u_ * xs, u_, 10.0,
                    jnp.asarray(1000.0), jnp.asarray(True), impl="auto",
                )
                return loss

            def body(i, acc):
                v, g = jax.value_and_grad(f)(u + acc * 0.0)
                return acc + v + jnp.sum(g[0])

            return jax.lax.fori_loop(0, iters, body, 0.0)

        float(loss_grad_many(xs, u))
        t0 = time.time()
        float(loss_grad_many(xs, u))
        dt = (time.time() - t0) / iters
        flops = 3 * (2 * n) ** 2 * d * 2  # fwd + recompute-bwd Gram matmuls
        log(f"MMD Gram fwd+bwd (n={n}, d={d}): {dt*1e3:.2f} ms "
            f"-> {flops/dt/1e12:.1f} TFLOP/s")
    except Exception as e:  # pragma: no cover
        log(f"gram bench skipped: {e}")

    # --- secondary: stress-config fit throughput (d=10240) ------------------
    try:
        xs_fit = jnp.asarray(
            rng.normal(size=(2000, 10240)).astype(np.float32)
        )
        stress_cfg = TrainConfig(ndims=10240, batch_size=500, mmd_impl="auto")
        s_epochs = 100  # 400 steps
        state_s, losses_s = no_kl_fit_program(
            xs_fit, jax.random.PRNGKey(3), stress_cfg, s_epochs
        )
        float(losses_s[-1])
        t_s = []
        for r in range(2):
            t0 = time.time()
            state_s, losses_s = no_kl_fit_program(
                xs_fit, jax.random.PRNGKey(4 + r), stress_cfg, s_epochs
            )
            float(losses_s[-1])
            t_s.append(time.time() - t0)
        dt_s = float(np.min(t_s))
        s_steps = s_epochs * (xs_fit.shape[0] // stress_cfg.batch_size)
        log(f"stress fit (d=10240): {s_steps} steps in min {dt_s:.2f}s -> "
            f"{s_steps/dt_s:.0f} steps/s (ref CPU: 0.040)")

        # bf16 stress options: bf16 model-matmul operands + bf16-stored
        # Adadelta EMAs (the roofline says optimizer-state HBM traffic and
        # the MLP's own matmuls bound this regime, docs/KERNELS.md)
        stress16 = TrainConfig(
            ndims=10240, batch_size=500, mmd_impl="auto",
            gram_matmul_dtype="bfloat16", model_matmul_dtype="bfloat16",
            opt_state_dtype="bfloat16",
        )
        state_s, losses_s = no_kl_fit_program(
            xs_fit, jax.random.PRNGKey(3), stress16, s_epochs
        )
        float(losses_s[-1])
        t_s16 = []
        final16 = 0.0
        for r in range(2):
            t0 = time.time()
            state_s, losses_s = no_kl_fit_program(
                xs_fit, jax.random.PRNGKey(4 + r), stress16, s_epochs
            )
            final16 = float(losses_s[-1])
            t_s16.append(time.time() - t0)
        dt_s16 = float(np.min(t_s16))
        log(f"stress fit bf16 (model+opt-state+gram): {s_steps} steps in "
            f"min {dt_s16:.2f}s -> {s_steps/dt_s16:.0f} steps/s "
            f"(final loss {final16:.4f})")
        del xs_fit, state_s
    except Exception as e:  # pragma: no cover
        log(f"stress fit bench skipped: {e}")

    # --- flagship: rank-1 panel Gram at m=40960 x d=10240 --------------------
    # (round-3 VERDICT item 2: the best-MFU shape must be driver-captured,
    # not builder-claimed. Same measurement as examples/tpu_kernel_parity.py:
    # value_and_grad through the fused kernel, bf16 operands / f32
    # accumulate, in-program loop; ~0.7 s/step so 2 iters amortize the
    # ~20 ms tunnel dispatch to <2%.)
    try:
        from vgan_tpu.ops import mmd as M
        from vgan_tpu.ops.pallas.mmd_gram import mmd2_pallas_core

        n1 = n2 = 20480
        d_f = 10240
        xf1 = jnp.asarray(rng.normal(size=(n1, d_f)).astype(np.float32))
        yf1 = jnp.asarray(
            rng.normal(size=(n2, d_f)).astype(np.float32) + 0.2
        )
        bw_f = M.candidate_bandwidth(jnp.concatenate([xf1, yf1]))
        mults_f = M.bandwidth_multipliers()
        f_iters = 2

        @jax.jit
        def flagship_many(x_, y_):
            def body(i, acc):
                v, (gx, gy) = jax.value_and_grad(
                    lambda a, b: mmd2_pallas_core(
                        a, b, bw_f, mults_f, "bfloat16"
                    ),
                    argnums=(0, 1),
                )(x_ + acc * 0.0, y_)
                return acc + v + jnp.sum(gx[0]) + jnp.sum(gy[0])

            return jax.lax.fori_loop(0, f_iters, body, 0.0)

        float(flagship_many(xf1, yf1))  # compile + warm
        best = min(
            (lambda t0: (float(flagship_many(xf1, yf1)),
                         time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(3)
        )
        m_f = n1 + n2
        # honest flops: the K'-stash backward (round 4) removes the
        # recompute matmul, so the executed work is 4 m^2 d, not the
        # recompute-convention 6 m^2 d older rounds reported
        from vgan_tpu.ops.pallas.mmd_gram import _pad_layout, _stash_kprime
        M_p, D_p, _ = _pad_layout(m_f, d_f)
        units = 4.0 if _stash_kprime(M_p, D_p) else 6.0
        tfs = units * m_f * m_f * d_f * f_iters / best / 1e12
        log(f"flagship Gram fwd+bwd (m={m_f}, d={d_f}, bf16 dots, "
            f"{'K-stash' if units == 4.0 else 'panel'} bwd): "
            f"{best/f_iters*1e3:.0f} ms/step -> {tfs:.1f} TFLOP/s honest "
            f"({100*tfs*1e12/197e12:.0f}% of the 197 TFLOP/s v5e bf16 peak; "
            f"round-3 recompute convention: "
            f"{6.0*m_f*m_f*d_f*f_iters/best/1e12:.1f})")
        del xf1, yf1
    except Exception as e:  # pragma: no cover
        log(f"flagship gram bench skipped: {e}")

    # --- secondary: kl stress fit (d=10240) ----------------------------------
    # (round-3 VERDICT item 2b: BASELINE.md lists the kl stress line as
    # builder-claimed; capture it in the driver bench.)
    try:
        from vgan_tpu.train.steps import AlternationSchedule, kl_fit_program

        xs_fit = jnp.asarray(
            rng.normal(size=(2000, 10240)).astype(np.float32)
        )
        kl_stress_cfg = TrainConfig(
            ndims=10240, batch_size=500, mmd_impl="auto",
        )
        ks_epochs = 100  # 400 steps
        ks_phases = jnp.asarray(
            AlternationSchedule(1, 5).phase_array(ks_epochs)
        )
        _, det_h, _ = kl_fit_program(
            xs_fit, jax.random.PRNGKey(5), ks_phases, kl_stress_cfg
        )
        float(det_h[-1])
        t_ks = []
        for r in range(2):
            t0 = time.time()
            _, det_h, _ = kl_fit_program(
                xs_fit, jax.random.PRNGKey(6 + r), ks_phases, kl_stress_cfg
            )
            float(det_h[-1])
            t_ks.append(time.time() - t0)
        dt_ks = float(np.min(t_ks))
        ks_steps = ks_epochs * (xs_fit.shape[0] // kl_stress_cfg.batch_size)
        log(f"kl stress fit (d=10240): {ks_steps} steps in min {dt_ks:.2f}s "
            f"-> {ks_steps/dt_ks:.0f} steps/s (ref CPU: est. <0.05)")

        # bf16 variant (round-4 VERDICT item 9: the kl stress bf16 line was
        # builder-claimed only; capture it in the driver record)
        kl_stress16 = TrainConfig(
            ndims=10240, batch_size=500, mmd_impl="auto",
            gram_matmul_dtype="bfloat16", model_matmul_dtype="bfloat16",
            opt_state_dtype="bfloat16",
        )
        _, det_h, _ = kl_fit_program(
            xs_fit, jax.random.PRNGKey(5), ks_phases, kl_stress16
        )
        float(det_h[-1])
        t_ks16 = []
        for r in range(2):
            t0 = time.time()
            _, det_h, _ = kl_fit_program(
                xs_fit, jax.random.PRNGKey(6 + r), ks_phases, kl_stress16
            )
            float(det_h[-1])
            t_ks16.append(time.time() - t0)
        dt_ks16 = float(np.min(t_ks16))
        log(f"kl stress fit bf16 (d=10240): {ks_steps} steps in min "
            f"{dt_ks16:.2f}s -> {ks_steps/dt_ks16:.0f} steps/s")
        del xs_fit
    except Exception as e:  # pragma: no cover
        log(f"kl stress bench skipped: {e}")

    # --- secondary: d=20480 headroom fit (round-4 VERDICT item 9) ------------
    # Double the stress feature dim: proves the d-chunked Gram path has
    # headroom past the tracked stress config (examples/huge_fit_demo.py
    # covers the m=40960 side; this covers the d side in the driver record).
    try:
        d_h = 20480
        xs_h = jnp.asarray(rng.normal(size=(2000, d_h)).astype(np.float32))
        h_cfg = TrainConfig(
            ndims=d_h, batch_size=500, mmd_impl="auto",
            gram_matmul_dtype="bfloat16", model_matmul_dtype="bfloat16",
            opt_state_dtype="bfloat16",
        )
        h_epochs = 50  # 200 steps
        _, losses_h = no_kl_fit_program(
            xs_h, jax.random.PRNGKey(11), h_cfg, h_epochs
        )
        float(losses_h[-1])
        t_h = []
        for r in range(2):
            t0 = time.time()
            _, losses_h = no_kl_fit_program(
                xs_h, jax.random.PRNGKey(12 + r), h_cfg, h_epochs
            )
            final_h = float(losses_h[-1])
            t_h.append(time.time() - t0)
        dt_h = float(np.min(t_h))
        h_steps = h_epochs * (xs_h.shape[0] // h_cfg.batch_size)
        log(f"headroom fit bf16 (d=20480): {h_steps} steps in min {dt_h:.2f}s "
            f"-> {h_steps/dt_h:.0f} steps/s (final loss {final_h:.4f})")
        del xs_h
    except Exception as e:  # pragma: no cover
        log(f"headroom fit bench skipped: {e}")

    # --- secondary: subspaces sampled/sec -----------------------------------
    try:
        from vgan_tpu.models.generator import GeneratorBig
        from vgan_tpu.ops.activations import binarize_mask

        d = 100
        gen = GeneratorBig(out_features=d, latent_size=6)
        params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 6)))
        sample = jax.jit(
            lambda p, z: binarize_mask(gen.apply(p, z), axis=-1)
        )
        nsubs = 1_000_000
        z = jax.random.normal(jax.random.PRNGKey(1), (nsubs, 6))
        sample(params, z).block_until_ready()
        t0 = time.time()
        for _ in range(5):
            out = sample(params, z)
        out.block_until_ready()
        dt = (time.time() - t0) / 5
        log(f"subspace sampling (d={d}): {nsubs/dt/1e6:.1f} M subspaces/s")
    except Exception as e:  # pragma: no cover
        log(f"sampling bench skipped: {e}")

    # --- secondary: subspace-ensemble OD scoring throughput -----------------
    try:
        from vgan_tpu.ensemble import SubspaceEnsemble

        d = 100
        xtr = rng.normal(size=(1000, d)).astype(np.float32)
        xte = rng.normal(size=(500, d)).astype(np.float32)
        subs = rng.uniform(size=(1024, d)) < 0.3
        subs[~subs.any(axis=1), 0] = True
        ens = SubspaceEnsemble(subs, np.full(1024, 1 / 1024), base="knn", k=10)
        ens.fit(xtr)
        ens.decision_function(xte)  # compile
        t0 = time.time()
        for _ in range(3):
            scores = ens.decision_function(xte)
        dt = (time.time() - t0) / 3
        log(f"ensemble OD (KNN, 1024 masks, 1000 train x 500 test, d=100): "
            f"{dt*1e3:.0f} ms -> {1024/dt:.0f} subspace-scorings/s "
            "(API-level: includes per-call tunnel dispatch+fetch)")

        # kernel-level rate, dispatch-amortized (chained in-program loop —
        # the per-call line above pays ~20 ms tunnel overhead per call)
        from vgan_tpu.ops.pallas.knn_score import knn_scores_all_masks

        masks_j = jnp.asarray(subs)
        xte_j = jnp.asarray(xte)
        xtr_j = jnp.asarray(xtr)

        @jax.jit
        def knn_many(xte_j, xtr_j):
            def body(i, acc):
                s = knn_scores_all_masks(xte_j + acc * 0.0, xtr_j, masks_j, 10)
                return acc + s[0, 0]
            return jax.lax.fori_loop(0, 20, body, 0.0)

        float(knn_many(xte_j, xtr_j))
        t0 = time.time()
        float(knn_many(xte_j, xtr_j))
        dt_kernel = (time.time() - t0) / 20
        log(f"  fused KNN kernel (dispatch-amortized): {dt_kernel*1e3:.1f} "
            f"ms -> {1024/dt_kernel:.0f} subspace-scorings/s")

        # tunnel constant: a trivial program's dispatch + scalar fetch —
        # the irreducible per-call cost any API call pays here. Round-3
        # VERDICT item 3 asked for the API-vs-kernel gap to be killed or
        # quantified: decision_function is now ONE compiled program, so
        # API ~= kernel + this constant.
        noop = jax.jit(lambda a: a[0, 0] * 1.0)
        float(noop(xte_j))
        t_n = []
        for _ in range(5):
            t0 = time.time()
            float(noop(xte_j))
            t_n.append(time.time() - t0)
        dt_noop = float(np.median(t_n))
        resid = dt - dt_kernel - dt_noop
        log(f"  tunnel constant (no-op jit dispatch+fetch): "
            f"{dt_noop*1e3:.1f} ms; API-call residual beyond "
            f"kernel+tunnel: {resid*1e3:.1f} ms")
    except Exception as e:  # pragma: no cover
        log(f"ensemble bench skipped: {e}")

    # --- secondary: native isolation-forest ensemble ------------------------
    try:
        from vgan_tpu.ensemble import SubspaceEnsemble

        d = 100
        xtr = rng.normal(size=(1000, d)).astype(np.float32)
        xte = rng.normal(size=(500, d)).astype(np.float32)
        subs = rng.uniform(size=(256, d)) < 0.3
        subs[~subs.any(axis=1), 0] = True
        ens = SubspaceEnsemble(
            subs, np.full(256, 1 / 256), base="iforest", n_trees=100, chunk=32
        )
        ens.fit(xtr)
        ens.decision_function(xte)  # compile
        t0 = time.time()
        for _ in range(3):
            ens.decision_function(xte)
        dt = (time.time() - t0) / 3
        log(f"ensemble OD (iforest x100 trees, 256 masks): {dt*1e3:.0f} ms "
            f"-> {256/dt:.0f} subspace-forests/s")
    except Exception as e:  # pragma: no cover
        log(f"iforest bench skipped: {e}")

    # --- secondary: fused whole-fit kernel (opt-in fit_impl='fused') --------
    try:
        from vgan_tpu.ops.pallas.fused_no_kl import fused_no_kl_fit
        from vgan_tpu.train.steps import init_no_kl_state

        st0 = init_no_kl_state(config, jax.random.PRNGKey(0))
        xf = np.asarray(x)
        fused_no_kl_fit(xf, st0.params, config, epochs, jax.random.PRNGKey(0))
        t_f = []
        for r in range(3):  # host staging + H2D makes single runs noisy
            t0 = time.time()
            out = fused_no_kl_fit(
                xf, st0.params, config, epochs, jax.random.PRNGKey(1 + r)
            )
            np.asarray(out[3])
            t_f.append(time.time() - t0)
        dt_f = float(np.min(t_f))
        log(f"fused whole-fit kernel: {steps} steps in min {dt_f:.3f}s -> "
            f"{steps/dt_f:.0f} steps/s (scan path above is the default)")
    except Exception as e:  # pragma: no cover
        log(f"fused bench skipped: {e}")

    print(json.dumps({
        "metric": "VGAN_no_kl train steps/sec (n=2000, d=10, bs=500)",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_CPU_NO_KL_STEPS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
