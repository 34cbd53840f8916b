"""Training-path benchmarks: step/s, MP/s and derived MFU on one TPU chip.

r2 VERDICT #6: all driver-visible numbers were inference-only; the
reference's whole Lightning stack exists to train (reference
src/mon/nn/model.py:701-880 training_step, core/data/datamodule.py:85-169
dataloaders). This measures the enhax equivalents end to end:

  1. zero_dce_256_b8_train  — Zero-DCE 256x256 batch 8 jitted train step
     (the README's quoted 24 ms/step, recorded as an artifact).
  2. hinet_gopro_256_b16_train — HINet 256x256 GoPro-style patch training,
     batch 16, fed by batch_iterator+prefetch_to_device from synthetic
     host data (the input pipeline measured at speed, not just the step).
  3. nafnet_sidd_256_b16_train — NAFNet-width32 SIDD-style patch training.

Each row reports ms/step, steps/s, train MP/s (batch*H*W/step-time) and
MFU vs the chip's advertised bf16 peak (f32 here: params and step math are
f32 — MFU is reported against f32 peak ~ half bf16 peak).

Timing: hard host sync per step batch (axon relay; see bench.py notes).
"""

from __future__ import annotations

import json
import time

import numpy as np

# Per-chip bf16 MXU peaks by device_kind (jax-ml.github.io/scaling-book
# hardware table); f32 step math runs the MXU at ~half the bf16 rate.
# Detected at runtime — MFU against the wrong generation's peak is not an
# MFU. Falls back to v5e if the kind string is unrecognized.
BF16_PEAKS = {
    "v4": 275e12,
    "v5e": 197e12, "v5litepod": 197e12,
    "v5p": 459e12,
    "v6e": 918e12, "trillium": 918e12,
}


def _chip_peaks():
    import jax
    kind = jax.devices()[0].device_kind.lower().replace(" ", "")
    bf16 = next((v for k, v in BF16_PEAKS.items() if k in kind), 197e12)
    return kind, bf16, bf16 / 2.0


def _model_flops_per_image(model, example, variables=None):
    """3x forward cost as the usual train-step FLOPs estimate
    (fwd + 2x bwd), from XLA cost analysis of the forward."""
    from enhax.utils.profiling import flops_of
    f = flops_of(lambda v, d: model.apply(v, d), variables, example)
    return 3.0 * f


def main(only: str | None = None):
    import os as _os

    # ENHAX_BENCH_SMOKE=1: CPU dry-run of every train-bench code path
    # (tiny shapes/models, 2 steps, artifact NOT written) — catches broken
    # rows before the self-armed sweep burns a healthy tunnel window.
    smoke = _os.environ.get("ENHAX_BENCH_SMOKE") == "1"
    from bench_probe import ensure_tpu, error_row
    if not smoke:
        err = ensure_tpu()
        if err is not None:
            print(error_row("bench_train", "megapixels/sec/chip", err))
            return
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    chip_kind, bf16_peak, f32_peak = _chip_peaks()
    print(json.dumps({"chip_kind": chip_kind, "bf16_peak": bf16_peak}),
          flush=True)

    from enhax.data.datamodule import prefetch_to_device
    from enhax.models.base import build_model
    from enhax.train.trainer import TrainState, make_train_step

    results = []

    def report(metric, mps, extra):
        row = {"metric": metric, "value": round(mps, 2),
               "unit": "train_megapixels/sec/chip", **extra}
        results.append(row)
        print(json.dumps(row), flush=True)
        import gc
        jax.clear_caches()
        gc.collect()

    SMOKE_KW = {  # tiny architectures for the CPU dry-run
        "zero_dce_re": {"num_channels": 8},
        "hinet_re": {"num_channels": 8, "depth": 2},
        "nafnet": {"width": 8, "middle_blk_num": 1, "enc_blk_nums": (1, 1),
                   "dec_blk_nums": (1, 1)},
    }

    def run(metric, model_name, batch, hw, steps=20, use_pipeline=False,
            ref_key="ref_image", precision=None, fused_train=False, **kw):
        if only is not None and metric != only:
            return
        if smoke:
            kw = {**kw, **SMOKE_KW.get(model_name, {})}
            batch, hw, steps = 2, 64, 2
        import os
        if fused_train:
            # route the training forward through the fused Pallas blocks
            # (custom VJP: Pallas fwd, lowered-XLA bwd — nafblock_fused)
            os.environ["ENHAX_FUSED_TRAIN"] = "1"
        try:
            model = build_model(model_name, **kw)
            rng = np.random.default_rng(0)
            h = w = hw

            def synth_batch(i):
                b = {"image": rng.uniform(0, 0.6, (batch, h, w, 3))
                     .astype(np.float32)}
                if ref_key:
                    b[ref_key] = rng.uniform(0, 1, (batch, h, w, 3)) \
                        .astype(np.float32)
                return b

            example = {k: jnp.asarray(v) for k, v in synth_batch(0).items()}
            # TrainState carries the FULL variables dict; the optimizer
            # covers trainable leaves only, as Trainer.init_state does
            # (trainer.py init_state): forward_loss applies `variables`.
            variables = model.init(jax.random.PRNGKey(0), example)
            tx = optax.adam(1e-4)
            trainable = {k: v for k, v in variables.items()
                         if k != "batch_stats"}
            state = TrainState(0, variables, tx.init(trainable))
            step_fn = make_train_step(model, tx, precision=precision)
            key = jax.random.PRNGKey(1)

            # warmup / compile
            state, metrics = step_fn(state, example, key)
            _ = float(metrics["loss"])

            if use_pipeline:
                # host batches -> collate -> prefetch thread -> device;
                # measures the input pipeline feeding training at speed
                # (replaces DataLoader workers + pin_memory,
                # core/data/datamodule.py:85-169). A 4-batch pool is
                # pre-generated and cycled: this single-core host would
                # otherwise spend ~200ms/step in numpy RNG, measuring
                # synthetic-data generation rather than the pipeline.
                pool = [synth_batch(i) for i in range(4)]
                it = prefetch_to_device(
                    (pool[i % len(pool)] for i in range(steps)))
                t0 = time.perf_counter()
                n = 0
                for b in it:
                    state, metrics = step_fn(state, b, key)
                    n += 1
                _ = float(metrics["loss"])
                dt = (time.perf_counter() - t0) / n
            else:
                # chain all steps inside ONE jit dispatch so device time
                # dominates the ~29 ms relay RPC floor (chained per-call
                # enqueue lies on this relay — see bench.py notes)
                dev_batch = example

                @jax.jit
                def steps_fn(st, b, k):
                    def body(i, carry):
                        st, _ = carry
                        return step_fn(st, b, k)
                    return jax.lax.fori_loop(
                        0, steps, body, (st, metrics))

                st2, m2 = steps_fn(state, dev_batch, key)
                _ = float(m2["loss"])        # compile + sync
                t0 = time.perf_counter()
                st2, m2 = steps_fn(state, dev_batch, key)
                _ = float(m2["loss"])
                dt = max(time.perf_counter() - t0 - 0.029, 1e-9) / steps

            mps = batch * h * w / 1e6 / dt
            peak = bf16_peak if precision else f32_peak
            try:
                fl = _model_flops_per_image(model, example, variables)
                mfu = fl / dt / peak
            except Exception:  # noqa: BLE001
                fl, mfu = None, None
            report(metric, mps, {
                "ms_per_step": round(dt * 1e3, 2),
                "steps_per_sec": round(1.0 / dt, 2),
                ("mfu_bf16" if precision else "mfu_f32"):
                    round(mfu, 4) if mfu is not None else None,
                "pipeline": use_pipeline,
            })
        except Exception as e:  # noqa: BLE001
            report(metric, float("nan"), {"error":
                                          f"{type(e).__name__}: {str(e)[:120]}"})
        finally:
            if fused_train:
                os.environ.pop("ENHAX_FUSED_TRAIN", None)

    run("zero_dce_256_b8_train", "zero_dce_re", 8, 256, ref_key=None)
    run("hinet_gopro_256_b16_train", "hinet_re", 16, 256, use_pipeline=True)
    run("nafnet_sidd_256_b16_train", "nafnet", 16, 256, use_pipeline=True,
        width=32, middle_blk_num=12)
    # bf16-mixed training (trainer precision="bf16" — Lightning precision=16
    # equivalent): bf16 fwd/bwd, f32 master params/opt/loss
    run("hinet_gopro_256_b16_train_bf16", "hinet_re", 16, 256,
        use_pipeline=True, precision="bf16")
    run("nafnet_sidd_256_b16_train_bf16", "nafnet", 16, 256,
        use_pipeline=True, precision="bf16", width=32, middle_blk_num=12)
    # fused-forward training: Pallas NAFBlocks under grad via the custom
    # VJP (nafblock_fused; r4) — measures whether the fused fwd + lowered
    # bwd beats the plain flax train step
    run("nafnet_sidd_256_b16_train_fused", "nafnet", 16, 256,
        use_pipeline=True, fused_train=True, width=32, middle_blk_num=12)
    # device-resident chained steps (the zero_dce methodology): MFU of the
    # step math itself, with no host->tunnel feed in the loop. The
    # pipelined rows above measure the end-to-end rate THROUGH the axon
    # relay (~12.6 MB host->device per step over a tunnel) — that is the
    # serving number for THIS environment, not the device's training MFU;
    # a real pod host feeds over PCIe and overlaps transfers.
    run("hinet_gopro_256_b16_train_dev", "hinet_re", 16, 256)
    run("hinet_gopro_256_b16_train_bf16_dev", "hinet_re", 16, 256,
        precision="bf16")
    run("nafnet_sidd_256_b16_train_dev", "nafnet", 16, 256,
        width=32, middle_blk_num=12)
    run("nafnet_sidd_256_b16_train_bf16_dev", "nafnet", 16, 256,
        precision="bf16", width=32, middle_blk_num=12)
    run("nafnet_sidd_256_b16_train_fused_dev", "nafnet", 16, 256,
        fused_train=True, width=32, middle_blk_num=12)
    # remat rows (VERDICT r4 task 4): the step is HBM-bound (roofline AI
    # ~8.9 FLOP/B), so rematerializing each NAFBlock in the bwd trades
    # free recompute FLOPs for saved-activation traffic — raising the MFU
    # ceiling itself, not just occupancy
    run("nafnet_sidd_256_b16_train_remat_dev", "nafnet", 16, 256,
        width=32, middle_blk_num=12, remat=True)
    run("nafnet_sidd_256_b16_train_bf16_remat_dev", "nafnet", 16, 256,
        precision="bf16", width=32, middle_blk_num=12, remat=True)
    run("nafnet_sidd_256_b16_train_bf16_remat", "nafnet", 16, 256,
        use_pipeline=True, precision="bf16", width=32, middle_blk_num=12,
        remat=True)

    if smoke:
        bad = [r["metric"] for r in results if r.get("error")]
        print(json.dumps({"smoke": "bench_train", "rows": len(results),
                          "failed": bad}))
        raise SystemExit(1 if bad else 0)  # never write the artifact
    if only is None:
        with open("/root/repo/BENCH_TRAIN.json", "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    import sys
    if "--only" in sys.argv:
        main(only=sys.argv[sys.argv.index("--only") + 1])
    else:
        main()
