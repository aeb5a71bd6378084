"""Measure XLA composite vs fused Pallas styled-conv at the hot shapes.

Run on the real TPU (no JAX_PLATFORMS override). Prints per-shape device
times using the chained-fori methodology (host timing under-reports >10x
through the relay) and a KEEP/REJECT verdict per shape. The decision table
goes into ops/modulated_conv_pallas.py's docstring + docs/PERFORMANCE.md,
and GANECDOTES_STYLED_CONV_IMPL defaults follow it.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ganecdotes_tpu.ops.modulated_conv_pallas import (
    pallas_supported,
    styled_conv3x3,
    styled_conv3x3_ref,
)

# (B, H, W, Cin, Cout): the ffhq-256 synthesis stack's non-up styled convs
# at the benched batch (headline batch 32), plus car-512's 512px level
SHAPES = [
    (32, 64, 64, 512, 512),
    (32, 128, 128, 256, 256),
    (32, 256, 256, 128, 128),
    (8, 512, 512, 128, 128),   # car-512 tail at its benched batch
]


def timed(fn, args, iters=30):
    @jax.jit
    def prog(args):
        def body(i, s):
            # perturb x (NOT a late arg like noise): with x loop-invariant
            # XLA hoists the whole modulated conv out of the fori loop and
            # the composite times only its epilogue (observed: 531 "TF/s",
            # 2.7x over v5e bf16 peak)
            out = fn(args[0] + i * 1e-9, *args[1:])
            return s + out.astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(prog(args))  # compile + warm
    t0 = time.perf_counter()
    float(prog(args))
    return (time.perf_counter() - t0) / iters


def bench_up():
    """Three-way UP-branch comparison at the ffhq-256 up-conv shapes
    (input res; output is 2x), full StyledConv semantics (modulate +
    up-conv + blur + demod + noise + bias + lrelu):
      xla       — round-3 path: conv_transpose -> demod -> 2-pass blur ->
                  XLA epilogue fusion
      subpixel  — blur composed into one polyphase conv + fused
                  epilogue/depth-to-space pass (ops/subpixel_upconv.py)
      pallas    — fused kernel: polyphase matmuls + in-VMEM depth-to-space
                  + epilogue (ops/modulated_conv_pallas.styled_up_conv3x3)
    """
    from ganecdotes_tpu.nn.layers import conv2d_transpose_nhwc
    from ganecdotes_tpu.ops.fused_act import fused_leaky_relu
    from ganecdotes_tpu.ops.modulated_conv_pallas import (
        styled_up_conv3x3,
        styled_up_conv3x3_ref,
        up_pallas_supported,
    )
    from ganecdotes_tpu.ops.upfirdn2d import blur_2d

    dt = jnp.bfloat16
    print(f"device: {jax.devices()[0].device_kind} — UP-CONV comparison")
    for B, H, W, Ci, Co in [(32, 32, 32, 512, 512),
                            (32, 64, 64, 512, 256),
                            (32, 128, 128, 256, 128)]:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, Ci), dt)
        w = jnp.asarray(rng.randn(3, 3, Ci, Co) * 0.05, jnp.float32)
        s = jnp.asarray(rng.rand(B, Ci) + 0.5, jnp.float32)
        demod = jnp.asarray(rng.rand(B, Co) + 0.5, jnp.float32)
        noise = jnp.asarray(rng.randn(B, 2 * H, 2 * W, 1), dt)
        nw = jnp.asarray(0.3, jnp.float32)
        bias = jnp.asarray(rng.randn(Co) * 0.1, jnp.float32)

        def xla_path(x, w):
            xm = x * s[:, None, None, :].astype(x.dtype)
            y = conv2d_transpose_nhwc(xm, w.astype(x.dtype), stride=2)
            y = y * demod[:, None, None, :].astype(y.dtype)
            y = blur_2d(y, (1, 3, 3, 1), pad=(1, 1), upsample_factor=2)
            y = y + nw.astype(y.dtype) * noise.astype(y.dtype)
            return fused_leaky_relu(y, bias)

        def fusedT_path(x, w):
            # blur pre-composed into ONE 6x6 transposed conv
            # (lhs_dilation=2, pad 3): no blur passes, no explicit
            # depth-to-space — XLA picks the lowering for the dilated form
            from ganecdotes_tpu.ops.subpixel_upconv import compose_up_kernel

            xm = x * s[:, None, None, :].astype(x.dtype)
            K = compose_up_kernel(w).astype(x.dtype)
            y = jax.lax.conv_general_dilated(
                xm, K, (1, 1), ((3, 3), (3, 3)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y * demod[:, None, None, :].astype(y.dtype)
            y = y + nw.astype(y.dtype) * noise.astype(y.dtype)
            return fused_leaky_relu(y, bias)

        flops = 2 * B * (2 * H) * (2 * W) * 9 // 4 * Ci * Co  # useful MACs

        def timed2(fn):
            @jax.jit
            def prog(x, w):
                def body(i, acc):
                    return acc + fn(x + i * 1e-9, w).astype(
                        jnp.float32
                    ).mean()
                return jax.lax.fori_loop(0, 30, body, 0.0)
            float(prog(x, w))
            t0 = time.perf_counter()
            float(prog(x, w))
            return (time.perf_counter() - t0) / 30

        t_x = timed2(xla_path)
        t_s = timed2(lambda x, w: styled_up_conv3x3_ref(
            x, w, s, demod, noise, nw, bias))
        t_f = timed2(fusedT_path)
        d_f = jnp.max(jnp.abs(
            xla_path(x, w).astype(jnp.float32)
            - fusedT_path(x, w).astype(jnp.float32)))
        cfg = up_pallas_supported(x.shape, Co, 2)
        candidates = [(t_x, "xla"), (t_s, "subpixel"), (t_f, "fusedT")]
        if cfg is not None:
            t_p = timed2(lambda x, w: styled_up_conv3x3(
                x, w, s, demod, noise, nw, bias, impl="pallas"))
            d = jnp.max(jnp.abs(
                xla_path(x, w).astype(jnp.float32)
                - styled_up_conv3x3(x, w, s, demod, noise, nw, bias,
                                    impl="pallas").astype(jnp.float32)
            ))
            candidates.append((t_p, "pallas"))
            pal = (f"pallas {t_p*1e3:.3f} ms ({flops/t_p/1e12:.1f} TF/s) "
                   f"maxdiff {float(d):.4f}")
        else:
            pal = "pallas n/a (no VMEM-fitting tiling)"
        best = min(candidates)[1]
        print(
            f"B{B} {H}x{W}->{2*H}x{2*W} {Ci}->{Co} cfg={cfg}: "
            f"xla {t_x*1e3:.3f} ms ({flops/t_x/1e12:.1f} TF/s) | "
            f"subpixel {t_s*1e3:.3f} ms ({flops/t_s/1e12:.1f} TF/s) | "
            f"fusedT {t_f*1e3:.3f} ms ({flops/t_f/1e12:.1f} TF/s) "
            f"maxdiff {float(d_f):.4f} | "
            f"{pal} | best={best}"
        )


def main():
    dt = jnp.bfloat16
    print(f"device: {jax.devices()[0].device_kind}")
    for B, H, W, Cin, Cout in SHAPES:
        rng = np.random.RandomState(0)
        args = (
            jnp.asarray(rng.randn(B, H, W, Cin), dt),
            jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.05, jnp.float32),
            jnp.asarray(rng.rand(B, Cin) + 0.5, jnp.float32),
            jnp.asarray(rng.rand(B, Cout) + 0.5, jnp.float32),
            jnp.asarray(rng.randn(B, H, W, 1), dt),
            jnp.asarray(0.3, jnp.float32),
            jnp.asarray(rng.randn(Cout) * 0.1, jnp.float32),
        )
        th = pallas_supported(args[0].shape, Cout, dt.dtype.itemsize
                              if hasattr(dt, "dtype") else 2)
        flops = 2 * B * H * W * 9 * Cin * Cout

        t_xla = timed(styled_conv3x3_ref, args)
        t_pal = timed(
            lambda *a: styled_conv3x3(*a, impl="pallas"), args
        )
        # parity spot check at the benched shape
        d = jnp.max(
            jnp.abs(
                styled_conv3x3_ref(*args).astype(jnp.float32)
                - styled_conv3x3(*args, impl="pallas").astype(jnp.float32)
            )
        )
        verdict = "KEEP" if t_pal < t_xla else "REJECT"
        print(
            f"B{B} {H}x{W} {Cin}->{Cout} tile_h={th}: "
            f"xla {t_xla*1e3:.3f} ms ({flops/t_xla/1e12:.1f} TF/s) | "
            f"pallas {t_pal*1e3:.3f} ms ({flops/t_pal/1e12:.1f} TF/s) | "
            f"maxdiff {float(d):.4f} | {verdict}"
        )


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ganecdotes_tpu.runtime.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    if "--up" in sys.argv:
        bench_up()
    else:
        main()
