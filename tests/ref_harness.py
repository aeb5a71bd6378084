"""Run the ACTUAL reference PyTorch pipeline on CPU, under stubs.

Shared machinery for the cross-framework parity tests
(tests/test_cross_framework.py): imports `/root/reference`'s own
``src.one_shot_pipeline.OneShotPipeline`` with only the missing/unbuildable
dependencies stubbed —

* ``lib.gan.optim`` — the reference compiles CUDA kernels at import; the
  stub wires its documented pure-torch fallbacks (the same approach as
  tests/test_gan.py's BagGAN import tests);
* ``astropy`` / ``skimage`` — not installed; only reached by code paths the
  parity tests never call (FITS IO, unused metric imports);
* ``torchvision.transforms`` — not installed; Resize / ToTensor /
  ToPILImage implemented faithfully enough for the tiny square configs the
  tests use (Resize is an exact identity there);
* ``Module.cuda`` / ``Tensor.cuda`` — patched to no-ops so the reference's
  hard ``.cuda()`` calls run on the CPU-only torch in this image.

Nothing here alters reference COMPUTATION on the exercised paths: the
generator, feature concat, one-shot head, Adam fine-tune, tester, and
metric tables are the reference's own code.
"""

import os
import sys
import types

REF_PATH = "/root/reference"


def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = []  # every stub acts as a package so submodules resolve
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    parent, _, child = name.rpartition(".")
    if parent and parent in sys.modules:
        setattr(sys.modules[parent], child, mod)
    return mod


def setup_reference_pipeline():
    """Import and return the reference OneShotPipeline class (CPU-ready).

    Returns (torch, RefPipeline). Raises ImportError when the reference
    tree or torch is unavailable (callers pytest.skip on that).
    """
    import torch
    from torch.nn import functional as _F

    if not os.path.isdir(REF_PATH):
        raise ImportError("reference tree not available")
    os.environ.setdefault("MPLBACKEND", "Agg")
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)

    # ---- third-party stubs ------------------------------------------------
    _stub_module("astropy")
    _stub_module("astropy.io")
    _stub_module("astropy.io.fits")
    def _absent(*a, **k):  # placeholder for never-exercised skimage calls
        raise NotImplementedError("skimage is stubbed in the parity harness")

    _stub_module("skimage")
    _stub_module("skimage.measure", regionprops=_absent, label=_absent)
    _stub_module("skimage.segmentation")
    _stub_module("skimage.metrics")
    _stub_module("skimage.transform", rescale=_absent)
    _stub_module("skimage.exposure", equalize_hist=_absent,
                 rescale_intensity=_absent, match_histograms=_absent,
                 histogram_matching=_absent)

    if "apex" not in sys.modules:
        class _LARC:
            """Minimal stand-in for apex.parallel.LARC.LARC: delegate to the
            wrapped optimizer (trust-ratio scaling off). Only reached by the
            SSL pretraining paths, which the parity tests drive through the
            reference's shipped hyperparameters."""

            def __init__(self, optimizer, trust_coefficient=0.02, clip=True,
                         eps=1e-8):
                self.optim = optimizer

            def __getattr__(self, name):
                return getattr(self.__dict__["optim"], name)

        _stub_module("apex")
        _stub_module("apex.parallel")
        _stub_module("apex.parallel.LARC", LARC=_LARC)

    if "torchvision" not in sys.modules:
        from PIL import Image as _PILImage

        class _Resize:
            def __init__(self, size, interpolation=None, **kw):
                self.size = size
                self.interpolation = interpolation

            def __call__(self, t):
                size = self.size
                if isinstance(size, int):
                    size = (size, size)
                squeeze = False
                if t.ndim == 3:
                    t = t.unsqueeze(1)  # (N, H, W) labels -> (N, 1, H, W)
                    squeeze = True
                if tuple(t.shape[-2:]) == tuple(size):
                    out = t
                else:
                    # torchvision accepts PIL constants: Image.NEAREST is
                    # the INT 0 in this Pillow (not a Resampling enum)
                    interp = self.interpolation
                    nearest = interp is not None and (
                        (isinstance(interp, int) and int(interp) == 0)
                        or "NEAREST" in str(interp).upper()
                    )
                    mode = "nearest" if nearest else "bilinear"
                    dt = t.dtype
                    out = _F.interpolate(
                        t.float(), size=size, mode=mode,
                        **({} if mode == "nearest" else
                           {"align_corners": False}),
                    ).to(dt)
                return out.squeeze(1) if squeeze else out

        class _ToTensor:
            def __call__(self, pic):
                import numpy as _np

                arr = _np.asarray(pic)
                if arr.ndim == 2:
                    arr = arr[None]
                else:
                    arr = arr.transpose(2, 0, 1)
                t = torch.from_numpy(arr.copy())
                if t.dtype == torch.uint8:
                    t = t.float() / 255.0
                return t

        class _ToPILImage:
            def __call__(self, t):
                import numpy as _np

                arr = t.detach().cpu().numpy() if hasattr(t, "detach") else (
                    _np.asarray(t)
                )
                if arr.ndim == 3:
                    arr = arr.transpose(1, 2, 0)
                    if arr.shape[-1] == 1:
                        arr = arr[..., 0]
                arr = _np.clip(arr, 0, 1)
                return _PILImage.fromarray((arr * 255).astype("uint8"))

        def _make_grid(t, *a, **k):
            return t  # display-only; never asserted on

        class _Compose:
            def __init__(self, ts):
                self.transforms = ts

            def __call__(self, x):
                for t in self.transforms:
                    x = t(x)
                return x

        class _Identity:  # Random* transforms: constructed, never invoked on
            def __init__(self, *a, **k):  # the parity paths (fixed_transforms
                pass  # is built in load_trainer and not applied)

            def __call__(self, x):
                return x

        transforms = _stub_module(
            "torchvision.transforms",
            Resize=_Resize, ToTensor=_ToTensor, ToPILImage=_ToPILImage,
            Compose=_Compose, RandomHorizontalFlip=_Identity,
            RandomVerticalFlip=_Identity, RandomRotation=_Identity,
        )
        utils = _stub_module("torchvision.utils", make_grid=_make_grid)
        tv = _stub_module("torchvision", transforms=transforms, utils=utils)
        tv.__path__ = []  # mark as package so "torchvision.utils" resolves

    # ---- reference-internal stubs (CUDA-compiled ops) ---------------------
    import lib  # noqa: F401
    import lib.gan  # noqa: F401

    if "lib.gan.optim" not in sys.modules:
        from models.stylegan2.op import upfirdn2d

        def fused_leaky_relu(input, bias=None, negative_slope=0.2,
                             scale=2 ** 0.5):
            if bias is not None:
                rest = [1] * (input.ndim - bias.ndim - 1)
                input = input + bias.view(1, bias.shape[0], *rest)
            return _F.leaky_relu(input, negative_slope=0.2) * scale

        class FusedLeakyReLU(torch.nn.Module):
            def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
                super().__init__()
                self.bias = torch.nn.Parameter(torch.zeros(channel))
                self.negative_slope = negative_slope
                self.scale = scale

            def forward(self, x):
                return fused_leaky_relu(
                    x, self.bias, self.negative_slope, self.scale
                )

        gradfix = types.ModuleType("lib.gan.optim.conv2d_gradfix")
        gradfix.conv2d = _F.conv2d
        gradfix.conv_transpose2d = _F.conv_transpose2d
        optim = types.ModuleType("lib.gan.optim")
        optim.FusedLeakyReLU = FusedLeakyReLU
        optim.fused_leaky_relu = fused_leaky_relu
        optim.upfirdn2d = upfirdn2d
        optim.conv2d_gradfix = gradfix
        sys.modules["lib.gan.optim"] = optim
        sys.modules["lib.gan.optim.conv2d_gradfix"] = gradfix
        sys.modules["lib.gan"].optim = optim

    # ---- CPU-only torch: .cuda() must be a no-op --------------------------
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self

    # the reference predates torch 2.6's weights_only=True default and
    # pickles WHOLE modules (prototypes.pt/projection.pt); restore its
    # original load semantics for unqualified torch.load calls
    if not getattr(torch.load, "_ref_harness_wrapped", False):
        _orig_load = torch.load

        def _load(*a, **k):
            k.setdefault("weights_only", False)
            return _orig_load(*a, **k)

        _load._ref_harness_wrapped = True
        torch.load = _load

    from src.one_shot_pipeline import OneShotPipeline as RefPipeline

    return torch, RefPipeline


# ---------------------------------------------------------------------------
# tiny shared artifacts
# ---------------------------------------------------------------------------

CLASSES = ["background", "a", "b", "c"]


def build_tiny_artifacts(torch, out_dir, size=32, n_mlp=2, n_samples=4,
                         seed=0):
    """One set of artifacts BOTH frameworks consume: a torch ``g_ema``
    checkpoint (the reference's own Generator, randomly initialized), W
    latents, and luminance-quantile labels computed from the reference
    generator's images. Returns dict of paths."""
    import numpy as np

    from models.stylegan2.model import Generator as TorchGenerator

    os.makedirs(out_dir, exist_ok=True)
    torch.manual_seed(seed)
    g = TorchGenerator(size=size, style_dim=512, n_mlp=n_mlp)
    g.eval()

    ckpt = os.path.join(out_dir, "tiny_g_ema.pt")
    torch.save({"g_ema": g.state_dict()}, ckpt)

    rng = np.random.RandomState(seed + 1)
    z = torch.from_numpy(rng.randn(n_samples, 512).astype("float32"))
    with torch.no_grad():
        w = g.style(z)
        imgs, _ = g([w], input_is_latent=True, randomize_noise=False)
    lat_path = os.path.join(out_dir, "latents.pt")
    torch.save((w, None), lat_path)  # ref unpacks `latents, _ = load(...)`

    mean_latent = rng.randn(1, 512).astype("float32") * 0.01
    ml_path = os.path.join(out_dir, "mean_latent.npy")
    np.save(ml_path, mean_latent)

    lum = imgs.mean(dim=1).numpy()  # (N, H, W)
    n_class = len(CLASSES)
    qs = np.quantile(lum, np.linspace(0, 1, n_class + 1)[1:-1])
    labels = np.digitize(lum, qs).astype("int64")
    lbl_path = os.path.join(out_dir, "labels.pt")
    torch.save(torch.from_numpy(labels), lbl_path)

    model_cfg = os.path.join(out_dir, "model_config.py")
    with open(model_cfg, "w") as f:
        f.write(
            f"""
model_path = {ckpt!r}
num_latents_for_mean = 8
truncation = 0.7  # ALSO load-bearing: the truncation broadcast against the
# (1,512) mean latent is what promotes the reference's 1-D one-shot latent
# to 2-D (model.py:594-600); the harness pins mean_latent to a shared
# artifact on both pipelines so the truncated latents agree exactly
image_size = {size}
latent_dim = 512
gen_args = dict(size={size}, style_dim=512, n_mlp={n_mlp})
is_baggan = False
sample_latents = {lat_path!r}
sample_labels = {lbl_path!r}
sample_images = {out_dir!r}
one_shot_ind = 0
classes = {CLASSES!r}
"""
        )

    trainer_cfg = os.path.join(out_dir, "trainer_config.py")
    with open(trainer_cfg, "w") as f:
        f.write(
            """
lr = 0.001
beta1, beta2 = 0.9, 0.99
weight_decay = 0.0
losses = ['cross_entropy']
lambdas = [1.]
scheduler_type = 'step'
scheduler_args = dict(step_size=500, gamma=0.1)
num_epochs = 60
print_freq = 50
"""
        )

    return {
        "ckpt": ckpt,
        "latents": lat_path,
        "labels": lbl_path,
        "mean_latent": ml_path,
        "model_cfg": model_cfg,
        "trainer_cfg": trainer_cfg,
        "n_samples": n_samples,
        "size": size,
    }
