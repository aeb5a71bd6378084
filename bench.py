"""Headline benchmark: 256² generate+embed+segment throughput, img/s/chip.

This is the BASELINE.json metric: the reference's test loop generates an
image, builds per-pixel embeddings, and classifies every pixel — but
unbatched (MAX_TEST_BATCH=1, src/one_shot_pipeline.py:30) with a CPU
round-trip for the segmentor head (:610-662). Here the whole path is one
jitted batched bf16 program on the MXU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N,
   "extra": {...}}
vs_baseline = speedup over the same program run the reference's way
(batch=1, fp32) — the honest stand-in given the reference repo publishes no
numbers (BASELINE.json "published": {}).

"extra" carries the round-2 metrics VERDICT asked for:
  * mfu                       — achieved FLOP/s of the peak-batch program
                                (XLA cost_analysis) over the chip's dense
                                bf16 peak;
  * flops_per_image           — model cost from the same analysis;
  * finetune_s                — wall-clock of the full hfc_with_swav
                                ffhq-256 one-shot fine-tune (200 epochs,
                                configs/trainers/supervised_config.py),
                                incl. feature extraction and compiles;
                                north-star target < 60 s;
  * simclr_img_per_s,
    hfc_kmeans_img_per_s      — same generate→embed→segment program for the
                                other two learner families;
  * repurposegan_img_per_s,
    datasetgan_img_per_s      — the two raw-concat baseline serving paths
                                (fused first head layer; the (B,H,W,Σc)
                                concat never materializes);
  * batch                     — the peak batch found by the self-terminating
                                sweep (doubling until throughput regresses,
                                then a 1.5× midpoint probe);
  * labels_only_img_per_s     — mask-only serving mode (no image output, so
                                XLA drops the final convs + ToRGB chain;
                                see docs/PERFORMANCE.md honesty correction);
  * baggan_d_ms/baggan_g_ms/
    baggan_img_per_s          — BagGAN-HQ adversarial training step pair at
                                256² batch 16 with ADA (the GAN training
                                family's headline, scatter-free warp).
  * baggan_bf16_*             — the same pair under the mixed-precision
                                trainer knob (compute_dtype='bfloat16':
                                bf16 convs, fp32 master params/losses);
  * swav/simclr_pretrain_steps_per_s, swav_pretrain_sb2_steps_per_s
                              — production SSL pretrain update rates (sb2 =
                                2 vmapped samples/update, recording the
                                single-chip sample-batch rejection);
  * export_serving_img_per_s, export_vs_live
                              — the .ganex AOT serving artifact's
                                throughput vs the live-jit program (the
                                deployment story carries the perf);
  * skipped / partial / elapsed_s
                              — run-robustness metadata (stages skipped at
                                the BENCH_DEADLINE_S gate; partial-emission
                                note when the watchdog/SIGTERM printed).

Set BENCH_TRACE_DIR=/tmp/trace to capture a jax.profiler trace of one
headline step before the sweep (inspect with tensorboard/xprof).
"""

import json
import os
import signal
import sys
import threading
import time

import jax
import jax.numpy as jnp

# dense bf16 matmul peak per chip (public spec sheets)
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}

# HBM per chip by device_kind (public spec sheets) — the fallback when
# memory_stats() exposes no bytes_limit through the relay
HBM_GIB = {
    "TPU v2": 8,
    "TPU v3": 16,
    "TPU v4": 32,
    "TPU v5 lite": 16,
    "TPU v5e": 16,
    "TPU v5": 95,
    "TPU v5p": 95,
    "TPU v6 lite": 32,
    "TPU v6e": 32,
}

METRIC = "256x256 generate+segment throughput (hfc_with_swav path)"

# ---------------------------------------------------------------------------
# Round-robustness machinery (VERDICT r4 task 1). BENCH_r03 (relay outage)
# and BENCH_r04 (driver timeout before the single end-of-run print) both
# left the round with parsed=null. bench.py is now structurally unable to
# produce a null round:
#   (a) a global deadline (BENCH_DEADLINE_S, default 1200 s): every stage
#       checks a monotonic clock first and is skipped — recorded in
#       extra["skipped"] — once the run is past ~80% of the deadline;
#   (b) incremental emission: the best payload so far lives in _STATE and
#       a watchdog thread (armed right after backend init) prints it and
#       exits ~20 s before the deadline if _run_all hasn't returned; a
#       SIGTERM handler does the same for external kills, so even rc=124
#       still carries the headline JSON on stdout;
#   (c) cumulative relay-recovery budget: await_relay() draws from ONE
#       BENCH_RELAY_BUDGET_S pool (default 300 s) instead of burning up to
#       240 s per failed stage;
#   (d) sweep hints: each sweep seeds from the previous round's best batch
#       (.bench_hints.json, committed with the repo) so the headline needs
#       2-3 probes, not 6-8.
# ---------------------------------------------------------------------------

_T0 = time.monotonic()
# default chosen BELOW any plausible driver timeout (r04 was externally
# killed at an unknown budget; the full stage list measured 1210 s cold-ish
# and ~half that with the persistent compile cache warm) — if the watchdog
# never gets to fire because an external kill comes first, the SIGTERM
# handler is the only (weaker) fallback, so the deadline must win the race
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1200"))
_EMIT_MARGIN_S = 20.0
_STAGE_GATE_FRAC = 0.8
_LOCK = threading.RLock()
_STATE = {
    "payload": None,   # best payload so far (dict) — emitted on early death
    "stage": "backend_init",
    "skipped": [],
    "emitted": False,
    "stdout": sys.stdout,  # the REAL stdout; main() rebinds before redirect
}


def _elapsed():
    return time.monotonic() - _T0


def _remaining():
    return _DEADLINE_S - _elapsed()


def _set_stage(name):
    with _LOCK:
        _STATE["stage"] = name


def _publish(payload):
    """Install the payload that an early death would emit."""
    with _LOCK:
        _STATE["payload"] = payload


def _record(d, key, value):
    """Mutate a published dict under the lock (the watchdog thread may
    json.dumps the payload concurrently)."""
    with _LOCK:
        d[key] = value


def _gate(name):
    """True iff there is deadline budget left to start stage ``name``."""
    if _elapsed() < _DEADLINE_S * _STAGE_GATE_FRAC:
        _set_stage(name)
        return True
    with _LOCK:
        _STATE["skipped"].append(name)
    print(
        f"bench: skipping stage {name} ({_elapsed():.0f}s elapsed, past "
        f"{_STAGE_GATE_FRAC:.0%} of BENCH_DEADLINE_S={_DEADLINE_S:.0f})",
        file=sys.stderr,
    )
    return False


def _emit(note=None):
    """Print the one JSON line the driver parses — exactly once, from
    whichever thread gets there first."""
    with _LOCK:
        if _STATE["emitted"]:
            return
        _STATE["emitted"] = True
        payload = _STATE["payload"]
        if payload is None:
            payload = {
                "metric": METRIC,
                "value": None,
                "unit": "img/s/chip",
                "vs_baseline": None,
                "error": "deadline/termination before the headline completed",
            }
        else:
            payload = dict(payload)
        extra = dict(payload.get("extra") or {})
        if _STATE["skipped"]:
            extra["skipped"] = list(_STATE["skipped"])
        if note:
            extra["partial"] = note
            extra["stage_at_emit"] = _STATE["stage"]
        extra["elapsed_s"] = round(_elapsed(), 1)
        payload["extra"] = extra
        out = _STATE["stdout"]
    print(json.dumps(payload), file=out, flush=True)


def _arm_guards():
    """Arm the deadline watchdog thread + SIGTERM handler.

    The watchdog is a THREAD, not a signal/alarm: when the main thread is
    wedged inside the relay client's C code (an observed outage mode),
    deferred signal handlers never run — a daemon thread still does."""

    def _watch():
        while True:
            rem = _remaining() - _EMIT_MARGIN_S
            if rem <= 0:
                break
            time.sleep(min(rem, 5.0))
        with _LOCK:
            done = _STATE["emitted"]
        if not done:
            print(
                f"bench: deadline watchdog firing at {_elapsed():.0f}s "
                f"(stage={_STATE['stage']}) — emitting partial payload",
                file=sys.stderr,
            )
            _emit(note="deadline")
            os._exit(0)

    t = threading.Thread(target=_watch, daemon=True, name="bench-deadline")
    t.start()

    def _on_term(signum, frame):
        _emit(note=f"signal {signum}")
        os._exit(128 + signum)

    try:
        signal.signal(signal.SIGTERM, _on_term)
    except (ValueError, OSError):
        pass  # non-main thread (tests) — the watchdog still covers us


# --- sweep hints: previous round's best batch per method -------------------

_HINTS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_hints.json"
)


def _load_hints():
    try:
        with open(_HINTS_PATH) as f:
            return {k: int(v) for k, v in json.load(f).items()}
    except Exception:
        return {}


def _save_hint(method, batch):
    try:
        hints = _load_hints()
        hints[method] = int(batch)
        tmp = _HINTS_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(hints, f, indent=1, sort_keys=True)
            f.write("\n")
        os.replace(tmp, _HINTS_PATH)
    except Exception as e:
        print(f"bench: could not save sweep hint ({e!r})", file=sys.stderr)


# --- AOT memory gating (VERDICT r4 task 2) ---------------------------------


class MemoryGated(Exception):
    """A probe was skipped because AOT memory analysis says it can't fit."""


def _hbm_limit_bytes():
    """Per-chip HBM capacity: live memory_stats when available, else the
    device_kind spec table, else None (gating disabled)."""
    try:
        dev = jax.devices()[0]
    except Exception:
        return None
    try:
        ms = dev.memory_stats()
        if ms and ms.get("bytes_limit"):
            return int(ms["bytes_limit"])
    except Exception:
        pass
    gib = HBM_GIB.get(getattr(dev, "device_kind", ""))
    return gib * (1 << 30) if gib else None


def _mem_bytes(compiled):
    """Total HBM an executable needs (args + outputs + temps − aliased),
    from XLA's AOT memory analysis; None when unavailable."""
    try:
        ma = compiled.memory_analysis()
        if ma is None:
            return None
        if isinstance(ma, (list, tuple)):
            ma = ma[0]
        total = 0
        for attr in (
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "temp_size_in_bytes",
        ):
            total += int(getattr(ma, attr, 0) or 0)
        total -= int(getattr(ma, "alias_size_in_bytes", 0) or 0)
        return total if total > 0 else None
    except Exception:
        return None


def _predict_over_limit(b, mem_obs, limit):
    """Extrapolate a candidate batch's memory from this sweep's measured
    (batch → bytes) points BEFORE paying for its compile.

    The r04 failure tail was a minutes-long compile that died on an XLA
    HBM-exhaustion dump; post-compile gating can't prevent that, only
    extrapolation can. With two points: linear fit. With one point: scale
    fully linearly (an overestimate — params don't scale) and demand a
    1.25× margin before skipping so feasible batches aren't lost."""
    if not limit or not mem_obs:
        return None
    if len(mem_obs) == 1:
        (b0, m0), = mem_obs.items()
        est = m0 * (b / b0)
        return est if est > limit * 1.25 else None
    b0, b1 = sorted(mem_obs)[-2:]
    m0, m1 = mem_obs[b0], mem_obs[b1]
    slope = (m1 - m0) / (b1 - b0)
    est = m1 + slope * (b - b1)
    return est if est > limit * 0.95 else None


def _compile_gated(jfn, args, what=""):
    """lower+compile ``jfn`` and refuse to RUN it if AOT memory analysis
    says it exceeds the chip's HBM (raises MemoryGated instead of paying
    for a doomed execution). Returns the compiled executable."""
    compiled = jfn.lower(*args).compile()
    mem = _mem_bytes(compiled)
    _LAST_MEM[0] = mem
    limit = _hbm_limit_bytes()
    if mem and limit and mem > limit:
        raise MemoryGated(
            f"{what}: AOT memory {mem / 2**30:.2f} GiB > "
            f"HBM {limit / 2**30:.2f} GiB"
        )
    return compiled


# memory of the most recent _compile_gated/timed program — sweep() reads it
# to build its extrapolation points without widening timed()'s signature
# (tests monkeypatch timed with a (jfn, args, iters) lambda)
_LAST_MEM = [None]


def _flagship(key, size=256):
    from ganecdotes_tpu.models.stylegan2.generator import Generator

    return Generator(size=size, key=key)


def build(batch, dtype, method="swav"):
    """One jitted generate→embed→segment program for the given method."""
    from ganecdotes_tpu.models.stylegan2.generator import generator_forward
    from ganecdotes_tpu.selfsup.heads import (
        init_one_shot_segmentor,
        one_shot_segmentor_apply,
    )

    key = jax.random.PRNGKey(0)
    kg, ks, kh, kz = jax.random.split(key, 4)
    g = _flagship(kg, size=512 if method == "swav512" else 256)
    meta = g.meta
    mean_w = jnp.zeros((1, 512))

    def synth(gen_params, latents):
        return generator_forward(
            gen_params, meta, [latents], input_is_latent=True,
            truncation=0.7, truncation_latent=mean_w,
            randomize_noise=False, dtype=dtype,
        )

    if method == "swav":
        from ganecdotes_tpu.selfsup.embed import project_segment_single_conv
        from ganecdotes_tpu.selfsup.swav import init_swav_params

        ssl = init_swav_params(ks, 4864, 512, 5000, "linear")
        seg = init_one_shot_segmentor(kh, 512, 8, "XXS")

        # the pipeline's fused XXS path: head folded into the level
        # decomposition, no (B, H, W, 512) embedding in HBM
        def fn(gen_params, ssl_params, seg_params, latents):
            img, feats = synth(gen_params, latents)
            logits = project_segment_single_conv(
                feats, ssl_params["projection"][0]["weight"],
                seg_params[0]["weight"], seg_params[0]["bias"], hlen=4864,
            )
            # return the image too: "generate+segment" must pay for the
            # full synthesis. hlen=4864 stops the embedding after the first
            # 128² conv (reference create_pixel_feature_vectors semantics),
            # so a labels-only program legally DCEs the last three convs +
            # ToRGB chain (~half the FLOPs) — that mode is reported
            # separately as labels_only_img_per_s, not as the headline.
            return img, jnp.argmax(logits, axis=-1)

    elif method == "swav_labels_only":
        # mask-only serving: no image output, so XLA drops everything past
        # the last embedded feature level (legal because hlen=4864 uses
        # layers 0-9 only). Honest ONLY as a separately-labeled mode.
        from ganecdotes_tpu.selfsup.embed import project_segment_single_conv
        from ganecdotes_tpu.selfsup.swav import init_swav_params

        ssl = init_swav_params(ks, 4864, 512, 5000, "linear")
        seg = init_one_shot_segmentor(kh, 512, 8, "XXS")

        def fn(gen_params, ssl_params, seg_params, latents):
            img, feats = synth(gen_params, latents)
            logits = project_segment_single_conv(
                feats, ssl_params["projection"][0]["weight"],
                seg_params[0]["weight"], seg_params[0]["bias"], hlen=4864,
            )
            return jnp.argmax(logits, axis=-1)

    elif method == "swav512":
        # car-512 configuration (BASELINE config #4): deeper pyramid
        # (15 levels, hlen=5376), XS head over the 512-wide embedding —
        # first conv folded into the level decomposition (the 268 MB/img
        # embedding never materializes; see embed.project_segment_fcn)
        from ganecdotes_tpu.selfsup.embed import project_segment_fcn
        from ganecdotes_tpu.selfsup.swav import init_swav_params

        ssl = init_swav_params(ks, 5376, 512, 5000, "linear")
        seg = init_one_shot_segmentor(kh, 512, 12, "XS")

        def fn(gen_params, ssl_params, seg_params, latents):
            img, feats = synth(gen_params, latents)
            logits = project_segment_fcn(
                feats, ssl_params["projection"][0]["weight"],
                seg_params, "XS", hlen=5376,
            )
            return img, jnp.argmax(logits, axis=-1)

    elif method == "simclr":
        from ganecdotes_tpu.selfsup.simclr import (
            init_simclr_params,
            simclr_predict_segment,
        )

        ssl = init_simclr_params(ks, 4864, 512)
        seg = init_one_shot_segmentor(kh, 512, 8, "XS")

        def fn(gen_params, ssl_params, seg_params, latents):
            img, feats = synth(gen_params, latents)
            # fused pipeline path: per-image BN as axis reductions, lin2
            # folded into the head's first conv (no second full-res
            # 512-wide tensor) — exact vs the vmapped per-image form
            logits = simclr_predict_segment(
                ssl_params, feats, seg_params, "XS", 4864
            )
            return img, jnp.argmax(logits, axis=-1)

    elif method == "hfc_kmeans":
        from ganecdotes_tpu.selfsup.augmentor import group_features_by_block
        from ganecdotes_tpu.selfsup.kmeans import hfc_segment_fcn

        # hfc_kmeans_config: 5 layers, [4,8,16,32,64] clusters, out 256
        cpl = [4, 8, 16, 32, 64]
        n_layers = len(cpl)
        # probe under jit: one eager 256² forward through the relay costs
        # minutes of per-op dispatch
        _, probe = jax.jit(synth)(g.params, jnp.zeros((1, 512)))
        groups = group_features_by_block(probe, skip_const=True)
        kc = jax.random.split(ks, n_layers)
        centers = [
            jax.random.normal(kc[i], (cpl[i], groups[i].shape[-1]))
            for i in range(n_layers)
        ]
        ssl = centers
        seg = init_one_shot_segmentor(kh, sum(cpl), 8, "S")

        def fn(gen_params, centers, seg_params, latents):
            img, feats = synth(gen_params, latents)
            # concat=False: assignment runs per channel part, the per-level
            # group-concat copies never reach HBM
            groups = group_features_by_block(
                feats, skip_const=True, concat=False
            )
            # fused flat path: native-res one-hot maps through the
            # polyphase first conv — the (B, 256², Σk) one-hot concat
            # (~2/3 of the unfused program's device time) never exists
            logits, _ = hfc_segment_fcn(
                groups[:n_layers], centers, cpl, 256, seg_params, "S"
            )
            return img, jnp.argmax(logits, axis=-1)

    elif method in ("repurposegan", "datasetgan"):
        # Baseline serving (ref baseline/{repurposegan,datasetgan}): raw
        # upsample+concat features into a dilated FCN / per-pixel MLP.
        # Both run the pipeline's fused form — the first head layer folds
        # into the level pyramid (embed.concat_segment_fcn /
        # heads.pixel_classifier_from_first), so the (B, 256, 256, Σc)
        # concat (~600 MB/img bf16 at Σc≈4.9k) never materializes.
        feat_shapes = jax.eval_shape(
            lambda p, z: synth(p, z)[1], g.params, jnp.zeros((1, 512))
        )

        if method == "repurposegan":
            from ganecdotes_tpu.selfsup.embed import concat_segment_fcn

            n_layers = 13  # configs/segmentors/repurposegan_config.py
            in_ch = sum(s.shape[-1] for s in feat_shapes[:n_layers])
            seg = init_one_shot_segmentor(kh, in_ch, 8, "XS")
            ssl = jnp.zeros(())  # no SSL stage in the baselines

            def fn(gen_params, _unused, seg_params, latents):
                img, feats = synth(gen_params, latents)
                logits = concat_segment_fcn(
                    feats, seg_params, "XS", n_layers=n_layers
                )
                return img, jnp.argmax(logits, axis=-1)

        else:
            from ganecdotes_tpu.selfsup.embed import project_feature_maps
            from ganecdotes_tpu.selfsup.heads import (
                init_pixel_classifier,
                pixel_classifier_from_first,
            )

            n_layers = 14  # configs/segmentors/datasetgan_config.py
            in_ch = sum(s.shape[-1] for s in feat_shapes[:n_layers])
            seg, state = init_pixel_classifier(kh, in_ch, 8)
            ssl = state  # BN stats ride the ssl slot

            def fn(gen_params, state, seg_params, latents):
                img, feats = synth(gen_params, latents)
                v1 = project_feature_maps(
                    feats[:n_layers], seg_params[0]["weight"]
                )
                v1 = v1 + seg_params[0]["bias"].astype(v1.dtype)
                logits = pixel_classifier_from_first(seg_params, state, v1)
                return img, jnp.argmax(logits, axis=-1)

    else:
        raise ValueError(method)

    latents = jax.random.normal(kz, (batch, 512))
    return jax.jit(fn), (g.params, ssl, seg, latents)


def timed(jfn, args, iters=20):
    """Per-call seconds via an on-device fori_loop + host scalar readback.

    A host-side dispatch loop with block_until_ready under-reports small
    programs by >10× through the TPU relay (measured: a 4096³ matmul chain
    "achieved" 5400 TFLOP/s that way). The loop body perturbs the latents by
    the loop index so nothing hoists out of the loop, and the scalar
    accumulator keeps every iteration live; TPU while-loops execute strictly
    sequentially, so wall time / iters is honest device time.
    """
    *params, latents = args

    @jax.jit
    def prog(params, latents):
        def body(i, s):
            o = jfn(*params, latents + i * 1e-9)
            # every output leaf feeds the accumulator so none is DCE'd
            return s + sum(
                x.astype(jnp.float32).mean() for x in jax.tree.leaves(o)
            )
        return jax.lax.fori_loop(0, iters, body, 0.0)

    # AOT-gated: if XLA's memory analysis says the loop program can't fit
    # in HBM, raise MemoryGated instead of paying for a doomed execution
    compiled = _compile_gated(prog, (params, latents), what="timed")
    float(compiled(params, latents))  # warm (compile already done)
    t0 = time.perf_counter()
    float(compiled(params, latents))
    return (time.perf_counter() - t0) / iters


def flops_of(jfn, args):
    """Model FLOPs of one program invocation via XLA cost analysis."""
    try:
        ca = jfn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def sweep(method="swav", iters=20, start=32, keep_best=False,
          save_hint=True):
    """Double the batch until throughput regresses, then probe the 1.5×
    midpoint below the regression point (no chip-specific magic numbers).

    Seeded from the previous round's best batch (.bench_hints.json): with
    a hint the usual cost is 2-3 probes (hint, 2×hint, midpoint) instead
    of a full doubling ladder from ``start``. If the hinted batch's first
    doubling regresses immediately, one octave below the hint is probed
    too so a stale (past-peak) hint can't pin the sweep high.

    Probes are AOT-memory-gated two ways (VERDICT r4 task 2): (a) before
    compiling, the candidate's HBM need is extrapolated from this sweep's
    measured memory_analysis points and the probe is skipped outright when
    it can't fit — the r04 tail's minutes-long doomed compile never starts;
    (b) after compiling, timed() refuses to execute a program whose AOT
    memory exceeds the chip's HBM (MemoryGated).

    Every probe's device buffers are deleted BEFORE the next probe runs:
    round 2 kept each swept batch's (executable, args) alive until the
    sweep finished, and the residual HBM pressure made in-driver sweeps
    regress early (hfc_kmeans peaked at 631 img/s @ batch 32 in-driver vs
    ~713 @ 192 standalone — the two now agree). ``keep_best`` rebuilds the
    winner's program afterwards for callers that need it (cost analysis).
    """
    results = {}  # batch -> img/s only; no buffers retained
    mem_obs = {}  # batch -> AOT bytes (successful compiles this sweep)
    limit = _hbm_limit_bytes()

    def probe(b):
        jfn, args = build(b, jnp.bfloat16, method)
        try:
            _LAST_MEM[0] = None
            tput = b / timed(jfn, args, iters)
            if _LAST_MEM[0]:
                mem_obs[b] = _LAST_MEM[0]
        finally:
            for leaf in jax.tree.leaves(args):
                if hasattr(leaf, "delete"):
                    leaf.delete()
            del jfn, args
        return tput

    def measure(b):
        if b in results:
            return results[b]
        est = _predict_over_limit(b, mem_obs, limit)
        if est is not None:
            print(
                f"bench: batch {b} skipped (AOT extrapolation: "
                f"~{est / 2**30:.1f} GiB > HBM {limit / 2**30:.1f} GiB)",
                file=sys.stderr,
            )
            results[b] = 0.0
            return 0.0
        if _remaining() < _EMIT_MARGIN_S + 30:
            print(f"bench: batch {b} skipped (deadline)", file=sys.stderr)
            results[b] = 0.0
            return 0.0
        try:
            try:
                results[b] = probe(b)
            except MemoryGated as e:
                if not results:
                    # even the smallest batch can't fit — a real breakage
                    raise
                print(f"bench: batch {b} skipped ({e})", file=sys.stderr)
                results[b] = 0.0
                return 0.0
            except Exception as e:
                # the relay's remote-compile helper intermittently 500s on
                # big programs (observed at batch 192/256 while smaller and
                # LARGER programs compiled fine) — one retry rescues the
                # sweep's best batch from a transient; a real OOM/breakage
                # fails identically twice.  A compile that died on HBM
                # exhaustion (the 500 wraps XLA's allocation dump) is NOT
                # transient: retrying re-runs a minutes-long doomed compile
                # and stresses the relay worker.
                r = repr(e)
                if "remote_compile" not in r or (
                    "out of memory" in r or "Largest program allocations" in r
                ):
                    raise
                print(f"bench: batch {b} retrying after transient relay "
                      f"compile failure", file=sys.stderr)
                results[b] = probe(b)
        except Exception as e:
            if not results:
                # the smallest batch failing is a real breakage, not an OOM
                # at the sweep's edge — don't report a silent 0.0 headline
                raise
            print(f"bench: batch {b} failed ({e!r})", file=sys.stderr)
            results[b] = 0.0
            await_relay()  # don't let a dead relay null the rest of the sweep
        return results[b]

    hint = _load_hints().get(method)
    first = hint if (hint and hint > start) else start
    b, prev = first, None
    while b <= 1024:
        tput = measure(b)
        if tput <= 0 or (prev is not None and tput < results[prev]):
            break
        prev = b
        b *= 2
    best_b = max(results, key=lambda k: results[k])
    if best_b == first and first > start and first // 2 >= 1:
        # hinted start may itself be past the peak — check one octave down
        measure(first // 2)
        best_b = max(results, key=lambda k: results[k])
    mid = best_b * 3 // 2
    if results[best_b] > 0 and mid not in results:
        measure(mid)
    best_b = max(results, key=lambda k: results[k])
    if save_hint and results[best_b] > 0:
        _save_hint(method, best_b)
    if keep_best:
        jfn, args = build(best_b, jnp.bfloat16, method)
        return best_b, (results[best_b], jfn, args)
    return best_b, (results[best_b], None, None)


_RELAY_BUDGET_S = float(os.environ.get("BENCH_RELAY_BUDGET_S", "300"))
_relay_spent = [0.0]


def await_relay(timeout_s=240, interval_s=20):
    """Block until the TPU relay answers a trivial dispatch (or time out).

    Called between bench stages after a stage fails: the round-4 run lost
    every extra after hfc_kmeans because the relay worker died mid-sweep
    and each later stage failed instantly, even though the relay recovers
    within a few minutes.  Returns True once a 1-element jit round-trips.

    Waiting draws from ONE cumulative pool (BENCH_RELAY_BUDGET_S, default
    300 s) shared by the whole run — r04 could legally burn 240 s per
    failed stage across ~12 stages, which alone blows any driver timeout.
    Also respects the global deadline.
    """
    budget = min(
        timeout_s,
        _RELAY_BUDGET_S - _relay_spent[0],
        _remaining() - _EMIT_MARGIN_S,
    )
    if budget <= 0:
        print(
            f"bench: relay-recovery budget exhausted "
            f"(spent {_relay_spent[0]:.0f}s of {_RELAY_BUDGET_S:.0f}s, "
            f"{_remaining():.0f}s to deadline)",
            file=sys.stderr,
        )
        return False
    t0 = time.monotonic()
    deadline = t0 + budget
    try:
        while True:
            try:
                jax.block_until_ready(
                    jax.jit(jnp.negative)(jnp.float32(1.0))
                )
                return True
            except Exception as e:
                if time.monotonic() >= deadline:
                    print(f"bench: relay did not recover within "
                          f"{budget:.0f}s ({e!r})", file=sys.stderr)
                    return False
                print("bench: relay unresponsive, waiting for recovery",
                      file=sys.stderr)
                time.sleep(interval_s)
    finally:
        _relay_spent[0] += time.monotonic() - t0


def pretrain_steps_per_s(method="swav", iters=10, sample_batch=None,
                         size=256, overrides=None):
    """Steps/s of the production ffhq-256 SSL pretrain update — the
    reference's main `train()` loop body (hfc_with_swav/swav_clustering.py
    :320-460: 2-view perturbed synthesis, pixel gather-project, Sinkhorn,
    swapped loss, LARS update; configs/segmentors/hfc_with_swav_ffhq_config
    .py:21-47). One step = one sample (the reference's strictly-sequential
    budget); ``sample_batch=n`` measures n vmapped samples per update (the
    single-chip MXU-filling variant of the multi-chip key-axis sharding).

    Timed as a chained fori loop threading (ssl_params, opt_state) through
    the carry — honest device time, no dispatch pipelining."""
    from ganecdotes_tpu.configs import mapper as config_mapper
    from ganecdotes_tpu.utils.util import load_config

    seg = load_config(
        config_mapper.segmentors[
            "hfc_with_swav" if method == "swav" else "hfc_with_simclr"
        ],
        "seg_config",
    )
    pa = seg.hfc_prep_args["perturb_args"]

    key = jax.random.PRNGKey(2)
    kg, ks, kt = jax.random.split(key, 3)
    g = _flagship(kg, size=size)
    mc = {"truncation": 0.7, "latent_dim": 512}
    mean_w = jnp.zeros((1, 512))

    args_key = "swav_args" if method == "swav" else "simclr_args"
    sa = dict(seg.hfc_prep_args[args_key])
    if size != 256:
        # tiny-shape smoke (tests): hlen must match the smaller pyramid
        from ganecdotes_tpu.models.stylegan2.generator import channel_map

        cmap = channel_map()
        sa["hlen"] = sum(
            cmap[2 ** ((li + 5) // 2)] for li in range(g.meta["num_layers"])
        )
    sa.update(overrides or {})

    if method == "swav":
        from ganecdotes_tpu.selfsup.swav import (
            init_swav_params,
            make_swav_train_step,
        )

        ssl = init_swav_params(ks, sa["hlen"], sa["nclasses"],
                               sa["nprototypes"], sa["projn_nw"])
        optimizer, step = make_swav_train_step(
            g.meta, mc, pa, sa, seg.hfc_prep_args["sinkhorn_args"],
            mean_w, (size, size), sample_batch=sample_batch,
        )
    else:
        from ganecdotes_tpu.selfsup.simclr import (
            init_simclr_params,
            make_simclr_train_step,
        )

        ssl = init_simclr_params(ks, sa["hlen"], sa["nclasses"])
        optimizer, step = make_simclr_train_step(
            g.meta, mc, pa, sa, mean_w, (size, size),
        )
    opt_state = optimizer.init(ssl)

    @jax.jit
    def prog(gen_params, ssl, opt_state, k0):
        def body(i, c):
            ssl, opt_state = c
            k = jax.random.fold_in(k0, i)
            if method == "swav":
                keys = jax.random.split(k, sample_batch) if sample_batch \
                    else k
                ssl, opt_state, loss = step(
                    gen_params, ssl, opt_state, keys, i
                )
            else:
                ssl, opt_state, loss = step(gen_params, ssl, opt_state, k)
            return ssl, opt_state
        ssl, opt_state = jax.lax.fori_loop(0, iters, body, (ssl, opt_state))
        return jax.tree.leaves(ssl)[0].astype(jnp.float32).mean()

    compiled = _compile_gated(
        prog, (g.params, ssl, opt_state, kt), what=f"pretrain:{method}"
    )
    float(compiled(g.params, ssl, opt_state, kt))  # warm
    t0 = time.perf_counter()
    float(compiled(g.params, ssl, opt_state, kt))
    return iters / (time.perf_counter() - t0)


def baggan_step_stats(iters=8, size=256, batch=16, mlp_layers=8,
                      compute_dtype=None, key_prefix="baggan",
                      ada_warp_impl=None):
    """BagGAN-HQ adversarial training throughput at 256², batch 16, ADA on
    (the scripts/gan_step_bench.py configuration PERFORMANCE.md documents
    as D 174 + G 107 ms = 57 img/s). Returns {'baggan_d_ms', 'baggan_g_ms',
    'baggan_img_per_s'} so the round-3 scatter-free-warp win is a driver
    artifact, not only a doc claim. Chained-fori timing of the two jitted
    step programs (the plain-iteration pair; lazy R1/PPL amortize to ~6%
    of wall time at d_reg_every=16/g_reg_every=4 in the production CLI,
    measured separately in docs/PERFORMANCE.md). With
    compute_dtype='bfloat16' + key_prefix='baggan_bf16' it records the
    mixed-precision trainer knob's variant (gan/train.py)."""
    import types

    import numpy as np

    from ganecdotes_tpu.gan.train import BagGANHQ

    cfg = types.SimpleNamespace(
        compute_dtype=compute_dtype,
        out_dir="/tmp/ganb_bench", checkpoint_dir="/tmp/ganb_bench/ckpt",
        is_train=True, image_size=size, latent_dim=512, num_channels=3,
        batch_size=batch, gan_mode="vanilla", use_ppl=True, r1_lambda=10,
        ppl_lambda=2, path_batch_shrink=2, ppl_decay=0.01, d_reg_every=16,
        g_reg_every=4, mixing_prob=0.9, chl_multiplier=2,
        g_reg_ratio=4 / 5, d_reg_ratio=16 / 17, augment=True, augment_p=0,
        ada_target=0.6, ada_length=500_000, lr=0.002, beta1=0.0,
        lr_policy="linear",
        lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
        generator_params=dict(mlp_layers=mlp_layers),
        losses_to_print=["g_gan", "d"],
        start_epoch=1, continue_train=False, load_net=False,
    )
    if ada_warp_impl is not None:  # A/B knob (warp-kernel attribution)
        cfg.ada_warp_impl = ada_warp_impl
    gan = BagGANHQ(cfg)
    gan.setup_gan()
    real = jnp.asarray(
        np.random.RandomState(0).rand(batch, size, size, 3).astype(
            np.float32
        ) * 2 - 1
    )
    z = jax.random.normal(jax.random.PRNGKey(0), (batch, 512))
    key = jax.random.PRNGKey(1)

    def chained(fn):
        @jax.jit
        def prog(r):
            def body(i, s):
                o = fn(r + i * 1e-9)
                return s + sum(
                    x.astype(jnp.float32).mean()
                    for x in jax.tree.leaves(o)
                    if hasattr(x, "astype")
                )
            return jax.lax.fori_loop(0, iters, body, 0.0)

        compiled = _compile_gated(prog, (real,), what="baggan")
        float(compiled(real))  # warm
        t0 = time.perf_counter()
        float(compiled(real))
        return (time.perf_counter() - t0) / iters

    inj = jnp.asarray(min(3, gan.gen_meta["n_latent"] - 1))
    chains = baggan_chains(gan, z, key, inj)
    td = chained(chains["d"])
    tg = chained(chains["g"])
    return {
        f"{key_prefix}_d_ms": round(td * 1e3, 1),
        f"{key_prefix}_g_ms": round(tg * 1e3, 1),
        f"{key_prefix}_img_per_s": round(batch / (td + tg), 1),
    }


def baggan_chains(gan, z, key, inj):
    """The timed D/G step bodies, as functions of the real batch.

    Every chain keeps the UPDATED params/opt_state in its output: the loss
    alone is value_and_grad's *primal*, so returning only it lets XLA DCE
    the whole parameter backward + optimizer update and the timing
    degenerates to forward-only (advisor finding, round 4 — earlier
    rounds' baggan_g_ms under-reported for exactly this reason; the honest
    re-measure invalidated two rounds of published G/R1/PPL numbers).
    Module-level so ``test_bench.py`` can pin the backward-liveness
    property via XLA cost analysis.
    """
    return {
        "d": lambda r: gan._d_step(gan.disc_params, gan.opt_d_state,
                                   gan.generator_params, r, [z, z], key,
                                   gan.ada_state, inj)[:4],
        "g": lambda r: gan._g_step(gan.generator_params, gan.opt_g_state,
                                   gan.disc_params, [z, z], key,
                                   gan.ada_state["p"] + r[0, 0, 0, 0] * 0,
                                   inj)[:3],
        # forward-only oracle for the regression test: keeping ONLY the
        # loss is exactly the round-4 bug
        "g_loss_only": lambda r: gan._g_step(
            gan.generator_params, gan.opt_g_state, gan.disc_params,
            [z, z], key, gan.ada_state["p"] + r[0, 0, 0, 0] * 0, inj
        )[2],
    }


def finetune_northstar():
    """Full hfc_with_swav ffhq-256 one-shot fine-tune wall time (< 60 s
    north star, BASELINE.json): embed the one-shot sample, then 200 Adam
    epochs over the XXS head exactly as supervised_config prescribes."""
    import optax  # noqa: F401  (optax pulled in by the trainer)

    from ganecdotes_tpu.configs import mapper as config_mapper
    from ganecdotes_tpu.models.stylegan2.generator import generator_forward
    from ganecdotes_tpu.pipeline.trainer import make_supervised_finetune
    from ganecdotes_tpu.selfsup.heads import (
        init_one_shot_segmentor,
        one_shot_segmentor_apply,
    )
    from ganecdotes_tpu.selfsup.swav import (
        init_swav_params,
        swav_predict_from_features,
    )
    from ganecdotes_tpu.utils.util import load_config

    tc = load_config(config_mapper.trainer["supervised"], "trainer_config")

    key = jax.random.PRNGKey(1)
    kg, ks, kh, kz = jax.random.split(key, 4)
    g = _flagship(kg)
    ssl = init_swav_params(ks, 4864, 512, 5000, "linear")
    seg_params = init_one_shot_segmentor(kh, 512, 8, "XXS")

    meta = g.meta

    @jax.jit
    def extract(gen_params, ssl_params, z):
        _, feats = generator_forward(
            gen_params, meta, [z], input_is_latent=True,
            randomize_noise=False,
        )
        return swav_predict_from_features(ssl_params, feats, 4864, 512,
                                          "linear")

    t0 = time.perf_counter()
    features = jax.lax.stop_gradient(
        extract(g.params, ssl, jax.random.normal(kz, (1, 512)))
    )
    label = jnp.zeros((1, 256, 256), jnp.int32)

    lam = sum(tc.lambdas)
    loss_terms = [
        (l / lam, config_mapper.losses[n]) for n, l in zip(tc.losses, tc.lambdas)
    ]
    sched = config_mapper.lr_scheduler[tc.scheduler_type](**tc.scheduler_args)
    def apply_fn(p, s, x):
        return one_shot_segmentor_apply(p, x, "XXS"), s

    optimizer, run_chunk = make_supervised_finetune(
        apply_fn, loss_terms, 256, tc.lr, betas=(tc.beta1, tc.beta2),
        lr_sched=sched,
    )
    opt_state = optimizer.init(seg_params)
    state = ()
    done = 0
    while done < tc.num_epochs:
        n = min(int(tc.print_freq), tc.num_epochs - done)
        seg_params, opt_state, state, loss = run_chunk(
            seg_params, opt_state, state, features, label, done, n
        )
        done += n
    jax.block_until_ready(loss)
    return time.perf_counter() - t0


def headline_only():
    """Quick A/B mode: just the headline sweep + MFU, one JSON line.
    Use with the impl env flags, e.g.
    GANECDOTES_UP_CONV_IMPL=subpixel python bench.py --headline

    Does not update the sweep-hint file: A/B runs under non-default impl
    flags would poison the production seed batch."""
    best_b, (best, jfn, args) = sweep("swav", keep_best=True,
                                      save_hint=False)
    flops = flops_of(jfn, args)
    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind)
    mfu = (flops * best / best_b) / peak if (flops and peak) else None

    print(json.dumps({
        "metric": "headline-only",
        "value": round(best, 2),
        "unit": "img/s/chip",
        "batch": best_b,
        "mfu": round(mfu, 4) if mfu else None,
        "styled_conv_impl": os.environ.get(
            "GANECDOTES_STYLED_CONV_IMPL", "xla"),
        "up_conv_impl": os.environ.get("GANECDOTES_UP_CONV_IMPL", "xla"),
    }))


def export_parity(batch=None, iters=10):
    """Serving-export parity cost (VERDICT r4 task 7): throughput of the
    deserialized ``.ganex`` AOT artifact vs the live-jit program for the
    SAME headline generate→embed→segment computation at the same batch —
    proves the deployment artifact carries the perf, not just the
    semantics (runtime/export.py; docs/MIGRATION.md serving-export)."""
    import tempfile

    from ganecdotes_tpu.runtime.export import export_fn, load_exported

    b = batch or _load_hints().get("swav") or 32
    jfn, args = build(b, jnp.bfloat16, "swav")
    try:
        live = b / timed(jfn, args, iters)
        path = os.path.join(
            tempfile.mkdtemp(prefix="ganex_bench_"), "serve.ganex"
        )
        export_fn(jfn, args, path)
        loaded, _meta = load_exported(path)
        exported = b / timed(loaded, args, iters)
    finally:
        for leaf in jax.tree.leaves(args):
            if hasattr(leaf, "delete"):
                leaf.delete()
    return {
        "export_serving_img_per_s": round(exported, 1),
        "export_live_img_per_s": round(live, 1),
        "export_vs_live": round(exported / live, 3) if live else None,
        "export_batch": b,
    }


def main():
    """Run every stage with stdout redirected to stderr, then print the one
    JSON line the driver parses to the REAL stdout.

    The BagGAN stage's reference-parity logger writes to stdout (as do any
    future stages that construct pipeline objects); without the redirect
    those lines land in front of the JSON and break the one-line contract.
    The payload is published incrementally (_publish/_record), so a
    deadline/SIGTERM death mid-run still emits everything measured so far.
    """
    import contextlib

    with _LOCK:
        _STATE["stdout"] = sys.stdout
    with contextlib.redirect_stdout(sys.stderr):
        payload = _run_all()
        _publish(payload)
    _emit()


def _run_all():
    from ganecdotes_tpu.runtime.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    if trace_dir:
        # one profiled headline step (inspect with tensorboard / xprof)
        jfn, args = build(32, jnp.bfloat16, "swav")
        out = jfn(*args)
        jax.block_until_ready(out)
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(jfn(*args))

    _set_stage("headline")
    best_b, (best, jfn, args) = sweep("swav", keep_best=True)

    flops = flops_of(jfn, args)
    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind)
    mfu = (flops * best / best_b) / peak if (flops and peak) else None

    extra = {
        "batch": best_b,
        "device_kind": kind,
        "flops_per_image": round(flops / best_b) if flops else None,
        "mfu": round(mfu, 4) if mfu else None,
    }
    payload = {
        "metric": METRIC,
        "value": round(best, 2),
        "unit": "img/s/chip",
        "vs_baseline": None,
        "extra": extra,
    }
    # from here on an early death still reports the headline + every extra
    # recorded so far
    _publish(payload)
    for leaf in jax.tree.leaves(args):
        if hasattr(leaf, "delete"):
            leaf.delete()
    del jfn, args

    # reference-shaped configuration: unbatched, fp32 (long chain: batch-1
    # programs are relay-noise dominated at short iteration counts)
    if _gate("vs_baseline"):
        try:
            jfn1, args1 = build(1, None, "swav")
            base = 1.0 / timed(jfn1, args1, iters=50)
            _record(payload, "vs_baseline", round(best / base, 2))
            del jfn1, args1
        except Exception as e:
            print(f"bench: vs_baseline failed ({e!r})", file=sys.stderr)
            await_relay()

    # GAN-training throughput early — after two artifact-less rounds the
    # baggan numbers are the highest-value unverified claims (and the
    # G-chain DCE fix above means these are the first HONEST G timings)
    for cdtype, prefix in ((None, "baggan"), ("bfloat16", "baggan_bf16")):
        if not _gate(f"{prefix}_steps"):
            continue
        jax.clear_caches()
        try:
            stats = baggan_step_stats(compute_dtype=cdtype,
                                      key_prefix=prefix)
            for k, v in stats.items():
                _record(extra, k, v)
        except Exception as e:
            print(f"bench: {prefix} stats failed ({e!r})", file=sys.stderr)
            _record(extra, f"{prefix}_img_per_s", None)
            await_relay()

    # car-512: keeps its best program for MFU attribution (is 512² compute-
    # or layout-bound? — the decomposition PERFORMANCE.md does for 256²)
    if _gate("car512"):
        jax.clear_caches()
        try:
            mb, (mt, mfn, margs) = sweep("swav512", iters=10, start=8,
                                         keep_best=True)
            _record(extra, "car512_img_per_s", round(mt, 1))
            _record(extra, "car512_batch", mb)
            if mfn is not None and peak:
                mflops = flops_of(mfn, margs)
                if mflops:
                    _record(extra, "car512_mfu",
                            round(mflops * mt / mb / peak, 4))
                    _record(extra, "car512_flops_per_image",
                            round(mflops / mb))
            for leaf in jax.tree.leaves(margs) if margs else []:
                if hasattr(leaf, "delete"):
                    leaf.delete()
            del mfn, margs
        except Exception as e:
            print(f"bench: car512 failed ({e!r})", file=sys.stderr)
            _record(extra, "car512_img_per_s", None)
            await_relay()

    if _gate("finetune"):
        try:
            _record(extra, "finetune_s", round(finetune_northstar(), 2))
            _record(extra, "finetune_target_s", 60.0)
        except Exception as e:
            print(f"bench: finetune failed ({e!r})", file=sys.stderr)
            _record(extra, "finetune_s", None)
            await_relay()

    # SSL pretraining throughput at the production ffhq-256 configs
    # (VERDICT r3 task 3); 1 step = 1 sample, the reference's budget.
    # The sb2 variant drives 2 vmapped samples per update — the MXU-filling
    # single-chip option PERFORMANCE.md measured-rejected; recording it in
    # the artifact makes that keep/reject decision driver-verified
    # (VERDICT r4 task 6). sb=4 is not probed: it compile-OOMs on a 16 GiB
    # v5e (4 samples × 2 perturbed-view syntheses + backward in one
    # program — measured 2026-08-20), which is itself the strongest
    # single-chip rejection.
    for method, key, sb in (
        ("swav", "swav_pretrain_steps_per_s", None),
        ("simclr", "simclr_pretrain_steps_per_s", None),
        ("swav", "swav_pretrain_sb2_steps_per_s", 2),
    ):
        if not _gate(key):
            continue
        jax.clear_caches()
        try:
            _record(extra, key,
                    round(pretrain_steps_per_s(method, iters=10,
                                               sample_batch=sb), 3))
        except Exception as e:
            print(f"bench: {key} failed ({e!r})", file=sys.stderr)
            _record(extra, key, None)
            await_relay()

    for method, key, start in (
        ("simclr", "simclr_img_per_s", 32),
        ("hfc_kmeans", "hfc_kmeans_img_per_s", 32),
        ("repurposegan", "repurposegan_img_per_s", 16),
        ("datasetgan", "datasetgan_img_per_s", 16),
        ("swav_labels_only", "labels_only_img_per_s", 64),
    ):
        if not _gate(key):
            continue
        jax.clear_caches()  # free the previous method's compiled programs
        try:
            mb, (mt, _, _) = sweep(method, iters=10, start=start)
            _record(extra, key, round(mt, 1))
            _record(extra, key.replace("_img_per_s", "_batch"), mb)
        except Exception as e:
            print(f"bench: {key} failed ({e!r})", file=sys.stderr)
            _record(extra, key, None)
            await_relay()

    # serving-export parity (VERDICT r4 task 7): one number proving the
    # .ganex AOT artifact carries the live program's throughput
    if _gate("export_parity"):
        jax.clear_caches()
        try:
            for k, v in export_parity().items():
                _record(extra, k, v)
        except Exception as e:
            print(f"bench: export_parity failed ({e!r})", file=sys.stderr)
            _record(extra, "export_vs_live", None)
            await_relay()

    return payload


def _emit_error(stage, exc):
    """One machine-readable line even when the TPU relay is down.

    Round 3's BENCH artifact was rc=1 + a 30-line traceback (relay outage),
    which left the driver's ``parsed`` field null.  Keep rc=1 (the run DID
    fail) but make the first stdout line structured so outage rounds are
    diagnosable at a glance.
    """
    import traceback

    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": None,
                "unit": "img/s/chip",
                "vs_baseline": None,
                "error": f"{type(exc).__name__}: {exc}",
                "stage": stage,
            }
        ),
        file=_STATE["stdout"],
        flush=True,
    )
    traceback.print_exc(file=sys.stderr)
    raise SystemExit(1)


if __name__ == "__main__":
    # fail fast + structured if the backend can't even initialize.  The
    # relay's observed outage modes are BOTH a raise ("Unable to initialize
    # backend") and an indefinite hang — a watchdog thread covers the
    # latter (os._exit because the main thread is stuck inside the client).
    def _init_watchdog():
        print(
            json.dumps(
                {
                    "metric": METRIC,
                    "value": None,
                    "unit": "img/s/chip",
                    "vs_baseline": None,
                    "error": "backend init timed out (TPU relay unresponsive)",
                    "stage": "backend_init",
                }
            ),
            flush=True,
        )
        os._exit(1)

    _timer = threading.Timer(
        float(os.environ.get("BENCH_INIT_TIMEOUT_S", "300")), _init_watchdog
    )
    _timer.daemon = True
    _timer.start()
    try:
        _devs = jax.devices()
    except Exception as e:  # RuntimeError("Unable to initialize backend...")
        _emit_error("backend_init", e)
    _timer.cancel()
    # deadline watchdog + SIGTERM handler: from here on, ANY death path
    # still prints the best partial payload (VERDICT r4 task 1)
    _arm_guards()
    try:
        if "--headline" in sys.argv:
            from ganecdotes_tpu.runtime.compile_cache import (
                enable_persistent_compilation_cache,
            )

            enable_persistent_compilation_cache()
            headline_only()
        else:
            main()
    except Exception as e:
        with _LOCK:
            _have_partial = _STATE["payload"] is not None
        if _have_partial:
            # the headline (at least) was measured — a later-stage crash
            # must not null the round; emit the partial payload and exit 0
            import traceback

            traceback.print_exc(file=sys.stderr)
            _emit(note=f"error: {type(e).__name__}: {e}")
            raise SystemExit(0)
        _emit_error("bench", e)
