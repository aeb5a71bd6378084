"""One-shot segmentation pipeline — setup / train / test orchestrator.

Behavioral twin of src/one_shot_pipeline.py:33-902, TPU-re-architected:

* the test block's generate→embed→segment path compiles into ONE jitted
  batched program per method (the reference runs MAX_TEST_BATCH=1 and
  round-trips features through the CPU, :610-665);
* the supervised fine-tune is a single lax.scan (pipeline.trainer);
* everything stays NHWC on device until masks are fetched for metrics.

Config resolution, block structure, method dispatch, metric table layout,
and output artifacts (CSVs, results.npz, collages, label_predictions) follow
the reference so downstream tooling is drop-in.
"""

import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from ganecdotes_tpu.models.stylegan2.generator import (
    Generator,
    generator_forward,
)
from ganecdotes_tpu.metrics.segmentation import (
    get_bb_dice,
    get_bb_iou,
    get_bin_iou,
    get_iou_vs_pd_curve,
    get_mask_dice,
    get_mask_iou,
    get_pd_at_iou_threshold,
    get_weighted_iou,
    plot_iou_vs_pd_curve,
)
from ganecdotes_tpu.ops.interp import resize_nearest
from ganecdotes_tpu.selfsup.embed import pixel_feature_maps
from ganecdotes_tpu.selfsup.heads import (
    init_one_shot_segmentor,
    init_pixel_classifier,
    one_shot_segmentor_apply,
    pixel_classifier_apply,
)
from ganecdotes_tpu.selfsup.kmeans import HFCPreprocessor
from ganecdotes_tpu.selfsup.simclr import SimCLRClustering
from ganecdotes_tpu.selfsup.swav import SwAVClustering, swav_predict_from_features
from ganecdotes_tpu.utils.util import get_logger, load_config
from ganecdotes_tpu.utils.visualization import (
    create_pil_collage,
    sample_label_colors,
    visualize_label_mask,
)

MAX_TEST_BATCH = 8  # the reference hardcodes 1 (:30); TPU batches over the MXU


def _load_tensor(path):
    """Load latents/labels shipped as torch .pt or numpy .npz/.npy."""
    if path.endswith(".pt"):
        import torch

        t = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(t, (tuple, list)):
            return tuple(np.asarray(x) for x in t)
        return np.asarray(t)
    data = np.load(path, allow_pickle=False)
    if hasattr(data, "files"):
        return np.asarray(data[data.files[0]])
    return np.asarray(data)


class OneShotPipeline:
    def __init__(self, out_dir, exp_name="", model="ffhq-256",
                 segmentor="hfc_kmeans", trainer="supervised", tester="all",
                 mode="offline", inputs="saved", custom=None, device=None,
                 num_test_samples=None, seed=42):
        del device  # single-controller JAX: devices come from the mesh
        from ganecdotes_tpu.configs import mapper as config_mapper

        self.config_mapper = config_mapper
        self.out_dir = out_dir
        os.makedirs(self.out_dir, exist_ok=True)

        self.start_time = time.strftime("%m%d%Y_%H%M%S", time.localtime())
        self.logfile = os.path.join(
            self.out_dir, f"one_shot_learner_{self.start_time}.log"
        )
        self.logger = get_logger("OneShot", self.logfile)
        self.summary_writer = _TensorBoardShim(
            os.path.join(self.out_dir, "tensorboard", f"run_{self.start_time}")
        )

        self.model_str = model
        self.seg_str = segmentor
        self.train_str = trainer
        self.test_str = tester
        self.mode = mode
        self.inputs = inputs
        self.exp_name = exp_name
        self.key = jax.random.PRNGKey(seed)

        self.logger.info("=" * 80)
        self.logger.info("One-Shot Learning Pipeline for StyleGANs (TPU)")
        self.logger.info("=" * 80 + "\n")
        self.logger.info("Loading Configurations ....")
        self.logger.info(self.exp_name)

        self.configs = {
            "model": config_mapper.models[self.model_str],
            "seg": config_mapper.segmentors[self.seg_str],
            "trainer": config_mapper.trainer[self.train_str],
        }
        if custom is not None:
            self.configs.update(custom)

        self.logger.info("Loading Pipeline Blocks ...\n")
        self.load_model()
        self.load_segmentor()
        self.load_trainer()
        self.logger.info("Loading Pipeline Blocks ... Done.")

        self.num_test_samples = num_test_samples

    # ------------------------------------------------------------------

    def load_model(self):
        """Pretrained StyleGAN2 (or BagGAN) generator (ref :118-178)."""
        self.logger.info("Loading Pretrained StyleGAN2 Model ... ")
        self.model_config = load_config(self.configs["model"], "model_config")

        self.key, kg = jax.random.split(self.key)

        if not self.model_config.is_baggan:
            self.model = Generator(**self.model_config.gen_args, key=kg)
            path = self.model_config.model_path
            if path and os.path.exists(path):
                from ganecdotes_tpu.models.stylegan2.convert import (
                    load_torch_checkpoint,
                )

                self.model.params, self.model.meta = load_torch_checkpoint(
                    path, self.model_config.gen_args["size"],
                    style_dim=self.model_config.gen_args.get("style_dim", 512),
                    n_mlp=self.model_config.gen_args.get("n_mlp", 8),
                )
                self.logger.info(f"Loaded checkpoint: {path}")
            else:
                self.logger.warning(
                    f"Checkpoint not found at {path} - using randomly "
                    "initialized generator weights"
                )
        else:
            from ganecdotes_tpu.models.baggan import load_baggan_generator

            self.model = load_baggan_generator(
                self.model_config, key=kg, logger=self.logger
            )

        self.color_map = sample_label_colors(len(self.model_config.classes))
        self.key, km = jax.random.split(self.key)
        self.mean_latent = self.model.mean_latent(
            self.model_config.num_latents_for_mean, key=km
        )
        self.logger.info(f"Model Name: {self.model_str}")

    def load_segmentor(self):
        """Segmentor + preprocessor selection (ref :181-224)."""
        self.logger.info("Loading Segmentor Network ... ")
        self.seg_config = load_config(self.configs["seg"], "seg_config")
        self.segmentor_params = None
        self.preprocessor = None

        if self.seg_str == "hfc_kmeans":
            self.preprocessor = HFCPreprocessor(
                model=self.model,
                model_config=self.model_config,
                out_dir=self.out_dir,
                logger=self.logger,
                **self.seg_config.hfc_prep_args,
            )

    def load_trainer(self):
        self.logger.info("Loading Trainer ... ")
        self.trainer_config = load_config(self.configs["trainer"], "trainer_config")
        for k in dir(self.trainer_config):
            if not k.startswith("__"):
                self.logger.info(f"{k}: {getattr(self.trainer_config, k)}")

    # ------------------------------------------------------------------

    def _build_ssl_preprocessor(self):
        args = dict(self.seg_config.hfc_prep_args)
        cls = (
            SwAVClustering
            if "hfc_with_swav" in self.seg_str
            else SimCLRClustering
        )
        return cls(
            model=self.model,
            model_config=self.model_config,
            out_dir=self.out_dir,
            logger=self.logger,
            tb=self.summary_writer,
            **args,
        )

    def get_image_from_latent(self, latent, return_features=False):
        img, feat = self.model(
            [jnp.asarray(latent)],
            truncation=self.model_config.truncation,
            truncation_latent=self.mean_latent,
            input_is_latent=True,
            randomize_noise=False,
        )
        return (img, feat) if return_features else img

    # ------------------------------------------------------------------

    def _synthesize_samples(self, n):
        """Fallback test data when checkpoints/latents/labels don't ship.

        Latents: style(randn). Labels: luminance-quantile pseudo-classes of
        the generated images — deterministic, learnable structure so the
        one-shot loop and metrics exercise end-to-end.
        """
        self.logger.warning(
            "sample latents/labels not found - synthesizing pseudo-labelled "
            f"samples ({n})"
        )
        self.key, kz = jax.random.split(self.key)
        z = jax.random.normal(kz, (n, self.model_config.latent_dim))
        w = self.model.style(z)

        imgs = []
        for i in range(0, n, MAX_TEST_BATCH):
            chunk = w[i : i + MAX_TEST_BATCH]
            pad = MAX_TEST_BATCH - chunk.shape[0]
            if pad > 0:  # pad the ragged tail: one compiled variant, not two
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], pad, axis=0)], axis=0
                )
            img = self.get_image_from_latent(chunk)
            imgs.append(np.asarray(img)[: MAX_TEST_BATCH - pad])
        imgs = np.concatenate(imgs, axis=0)
        size = self.model_config.image_size
        imgs = np.asarray(resize_nearest(jnp.asarray(imgs), size))
        lum = imgs.mean(axis=-1)
        n_class = len(self.model_config.classes)
        qs = np.quantile(lum, np.linspace(0, 1, n_class + 1)[1:-1])
        labels = np.digitize(lum, qs).astype(np.int64)
        return np.asarray(w), labels

    def run_pipeline(self, input_latent=None, input_noises=None,
                     blocks_to_run=("setup", "train", "test")):
        if "setup" in blocks_to_run:
            lat_path = self.model_config.sample_latents
            lbl_path = self.model_config.sample_labels

            if os.path.exists(lat_path) and os.path.exists(lbl_path):
                lat = _load_tensor(lat_path)
                if not hasattr(self.model_config, "sample_noises") and isinstance(
                    lat, tuple
                ):
                    lat = lat[0]
                self.test_latents = np.asarray(lat)
                self.test_labels = np.asarray(_load_tensor(lbl_path))
            else:
                n = self.num_test_samples or 10
                self.test_latents, self.test_labels = self._synthesize_samples(
                    n + 1
                )

            self.test_indices = list(range(self.test_labels.shape[0]))

            ind = self.model_config.one_shot_ind
            ind = min(ind, self.test_latents.shape[0] - 1)
            self.one_shot_latent = jnp.asarray(self.test_latents[ind, :])

            if self.test_labels.max() < 1:
                self.test_labels = self.test_labels * 255

            # special case for LSUN cars (ref :377-383)
            if "p-car" in self.model_str:
                lbl = np.zeros(
                    (self.test_labels.shape[0], self.test_labels.shape[2],
                     self.test_labels.shape[2])
                )
                lbl[:, 256 - 192 : 256 + 192, :] = self.test_labels.copy()
                self.test_labels = lbl

            self.one_shot_label = jnp.asarray(
                self.test_labels[ind : ind + 1].astype(np.int64)
            )

            if input_latent is not None and self.mode != "online":
                # the reference refuses fed latents outside online mode
                # (one_shot_pipeline.py setup block); silently ignoring one
                # would also leave the one-shot sample inside the test set
                raise ValueError("Cannot feed input latents in offline mode!")
            if self.mode == "online" and input_latent is not None:
                self.one_shot_latent = jnp.asarray(input_latent)
                # per-layer noise for the fed one-shot sample (ref :389-393):
                # the caller's noises, else a fresh draw. NOTE the reference
                # assigns one_shot_noise but never feeds it to a forward (all
                # its synthesis calls pass randomize_noise=False, and :440
                # overwrites it with randn afterwards) — here the INTENDED
                # semantics are implemented: the fed noise shapes the
                # one-shot synthesis.
                if input_noises is None:
                    self.key, kn = jax.random.split(self.key)
                    input_noises = self.model.make_noise(kn)
                self.one_shot_noise = [jnp.asarray(n) for n in input_noises]
            else:
                self.one_shot_noise = self._load_sample_noises()

            one_shot_in = self.one_shot_latent
            if one_shot_in.ndim == 1:
                one_shot_in = one_shot_in[None]
            synth_kw = dict(input_is_latent=True)
            if self.one_shot_noise is not None:
                synth_kw["noise"] = self.one_shot_noise
            else:
                synth_kw["randomize_noise"] = False
            if not hasattr(self.model_config, "sample_noises"):
                # the sample_noises model family (p-car / p-horse) skips
                # truncation in every setup forward (ref :395-399, 426-430)
                synth_kw["truncation"] = self.model_config.truncation
                synth_kw["truncation_latent"] = self.mean_latent
            self.one_shot_img, self.one_shot_features = self.model(
                [one_shot_in], **synth_kw
            )

            if self.mode == "online" and input_latent is None:
                from ganecdotes_tpu.gui.labeller import OneShotLabellerGUI

                self.logger.info("Initializing GUI ...")
                self.labeller = OneShotLabellerGUI(
                    self.transform_im_for_gui(self.one_shot_img),
                    self.model_config.classes,
                )
                self.one_shot_label = jnp.asarray(
                    self.labeller.get_labels()
                )[None]

            if input_latent is None:
                self.test_indices.remove(ind)
                self.test_latents = np.concatenate(
                    [self.test_latents[:ind], self.test_latents[ind + 1 :]], 0
                )
                self.test_labels = np.concatenate(
                    [self.test_labels[:ind], self.test_labels[ind + 1 :]], 0
                )

            if self.num_test_samples is None:
                self.num_test_samples = self.test_labels.shape[0]
            self.num_test_samples = min(
                self.num_test_samples, self.test_labels.shape[0]
            )

        if "train" in blocks_to_run:
            self.run_trainer()

        if "test" in blocks_to_run:
            self.run_tests()

    # ------------------------------------------------------------------

    def _load_sample_noises(self):
        """Per-layer noise for the one-shot synthesis from the
        ``sample_noises`` model-config path (pascal_car_512.py:21,
        pascal_horse_256.py:21).

        The reference declares the path but never loads it (its
        ``one_shot_noise`` is assigned and then overwritten with randn at
        one_shot_pipeline.py:440 without ever reaching a forward); here the
        config knob is honored: a file (list of per-layer tensors) or a
        directory of per-layer files, torch NCHW (B,1,H,W) converted to
        NHWC. Returns None (→ the generator's fixed noise buffers) when the
        config has no such attribute or nothing exists at the path.
        """
        path = getattr(self.model_config, "sample_noises", None)
        if not path or not os.path.exists(path):
            if path:
                self.logger.warning(
                    f"sample_noises path not found: {path} - using the "
                    "generator's fixed noise buffers"
                )
            return None
        if os.path.isdir(path):
            files = sorted(
                (f for f in os.listdir(path)
                 if f.endswith((".pt", ".npy", ".npz"))),
                key=lambda s: (len(s), s),  # noise_2 < noise_10
            )
            arrs = [_load_tensor(os.path.join(path, f)) for f in files]
        else:
            loaded = _load_tensor(path)
            arrs = list(loaded) if isinstance(loaded, (tuple, list)) else [
                np.asarray(a) for a in loaded
            ]
        noises = []
        for a in arrs:
            a = np.asarray(a, dtype=np.float32)
            if a.ndim == 3:
                a = a[None]
            if a.ndim == 4 and a.shape[1] == 1 and a.shape[-1] != 1:
                a = a.transpose(0, 2, 3, 1)  # torch NCHW -> NHWC
            noises.append(jnp.asarray(a))
        return noises or None

    def _extract_one_shot_features(self):
        """Method dispatch for one-shot training features (ref :475-531)."""
        if self.seg_str in ["repurposegan", "datasetgan"]:
            return pixel_feature_maps(
                self.one_shot_features, n_layers=self.seg_config.n_layers
            )

        if self.seg_str == "hfc_kmeans":
            if self.seg_config.train_hfc:
                self.preprocessor.train_hfc_model(self.one_shot_latent)
            feats, _ = self.preprocessor.predict_hfc_vectors(self.one_shot_latent)
            return feats

        # hfc_with_swav* / hfc_with_simclr
        if self.preprocessor is None or not isinstance(
            self.preprocessor, (SwAVClustering, SimCLRClustering)
        ):
            self.preprocessor = self._build_ssl_preprocessor()

        if self.seg_config.train_hfc:
            self.preprocessor.preprocess(self.one_shot_latent)
        elif getattr(self.preprocessor, "ssl_params", None) is None and isinstance(
            self.preprocessor, SwAVClustering
        ):
            self.preprocessor.preprocess(self.one_shot_latent)
        elif getattr(self.preprocessor, "params", None) is None and isinstance(
            self.preprocessor, SimCLRClustering
        ):
            self.preprocessor.preprocess(self.one_shot_latent)

        if "hfc_with_swav" in self.seg_str:
            feats, _ = self.preprocessor.predict_swav_codes(self.one_shot_latent)
        else:
            feats, _ = self.preprocessor.predict_simclr_codes(self.one_shot_latent)
        return feats

    def run_trainer(self):
        if self.train_str != "supervised":
            raise ValueError(f"unknown trainer {self.train_str}")

        self.one_shot_train_features = jax.lax.stop_gradient(
            self._extract_one_shot_features()
        )

        n_class = len(self.model_config.classes)
        in_ch = int(self.one_shot_train_features.shape[-1])
        seg_args = dict(self.seg_config.seg_args)
        seg_args.pop("in_ch", None)
        self.seg_size = seg_args.get("size", "S")

        self.key, kseg = jax.random.split(self.key)
        if self.seg_str == "datasetgan":
            self.segmentor_params, self.segmentor_state = init_pixel_classifier(
                kseg, in_ch, n_class
            )
            self._seg_is_mlp = True
        else:
            self.segmentor_params = init_one_shot_segmentor(
                kseg, in_ch, n_class, self.seg_size
            )
            self._seg_is_mlp = False
        # cross-framework hook: start the fine-tune from EXPLICIT weights
        # (the parity harness copies the reference head's torch init here so
        # both frameworks train the identical function from the same point;
        # segmentor_init_state carries the datasetgan MLP's BN buffers)
        if getattr(self, "segmentor_init_params", None) is not None:
            self.segmentor_params = self.segmentor_init_params
        if getattr(self, "segmentor_init_state", None) is not None:
            self.segmentor_state = self.segmentor_init_state

        self._train_segmentor()

    def _train_segmentor(self):
        """Supervised fine-tune (ref :533-581) as chunked jitted scans."""
        from ganecdotes_tpu.configs import mapper as config_mapper
        from ganecdotes_tpu.pipeline.trainer import make_supervised_finetune

        tc = self.trainer_config
        lambdas = list(tc.lambdas)
        lam_sum = sum(lambdas)
        loss_terms = [
            (lam / lam_sum, config_mapper.losses[name])
            for name, lam in zip(tc.losses, lambdas)
        ]
        sched = config_mapper.lr_scheduler[tc.scheduler_type](**tc.scheduler_args)
        stateful_sched = hasattr(sched, "step")

        size = self.seg_size
        is_mlp = self._seg_is_mlp

        if is_mlp:
            # thread the BatchNorm running stats through the scan so
            # eval-mode inference normalizes with the trained statistics
            def apply_fn(params, state, x):
                return pixel_classifier_apply(params, state, x, train=True)

        else:

            def apply_fn(params, state, x):
                return one_shot_segmentor_apply(params, x, size), state

        chunk = max(1, int(tc.print_freq))
        optimizer, run_chunk = make_supervised_finetune(
            apply_fn,
            loss_terms,
            self.model_config.image_size,
            tc.lr,
            betas=(tc.beta1, tc.beta2),
            lr_sched=None if stateful_sched else sched,
            stateful_sched=stateful_sched,
        )
        opt_state = optimizer.init(self.segmentor_params)

        features = self.one_shot_train_features
        label = self.one_shot_label
        state = self.segmentor_state if is_mlp else ()

        start = time.time()
        done = 0
        while done < tc.num_epochs:
            n = min(chunk, tc.num_epochs - done)
            self.segmentor_params, opt_state, state, loss = run_chunk(
                self.segmentor_params, opt_state, state, features, label,
                done, n,
            )
            done += n
            if stateful_sched:
                # torch ReduceLROnPlateau semantics: step on the loss.
                # Strong f32 scalar, matching what inject_hyperparams
                # stored: a raw python float is weak-typed and would
                # retrace + recompile the whole fine-tune scan program on
                # the next chunk (cf. gan/train.py update_learning_rate)
                mult = sched.step(float(loss))
                opt_state.hyperparams["learning_rate"] = jnp.asarray(
                    tc.lr * mult, jnp.float32
                )
            self.logger.info(
                f"{done:5}-th epoch | loss: {float(loss):6.4f} | "
                f"time: {time.time() - start:6.1f}sec"
            )
        if is_mlp:
            self.segmentor_state = state
        self.logger.info("******* Training Complete ********")

    # ------------------------------------------------------------------

    def transform_im_for_gui(self, im):
        return np.clip(np.asarray(im), -1.0, 1.0) * 0.5 + 0.5

    def _make_infer_fn(self):
        """ONE jitted batched generate→embed→segment program per method.

        ``model_config.inference_dtype = 'bfloat16'`` opts the whole program
        into bf16 (the benched MXU configuration); the default stays fp32
        for bit-level parity with converted reference checkpoints.
        """
        meta = self.model.meta
        truncation = self.model_config.truncation
        mean_latent = self.mean_latent
        seg_size = self.seg_size
        seg_str = self.seg_str
        dtype = getattr(self.model_config, "inference_dtype", None)
        if isinstance(dtype, str):
            dtype = jnp.dtype(dtype).type

        if "hfc_with_swav" in seg_str or seg_str == "hfc_with_simclr":
            pre = self.preprocessor

            if "hfc_with_swav" in seg_str:
                ssl_params = pre.ssl_params
                hlen = pre.swav_args["hlen"]
                interp = pre.swav_args.get("hf_interp", "nearest")
                projn = pre.swav_args["projn_nw"]

                from ganecdotes_tpu.selfsup.heads import DILATIONS

                if (
                    seg_size in DILATIONS
                    and not self._seg_is_mlp
                    and projn == "linear"
                    and interp == "nearest"
                ):
                    # FCN head + linear projection + nearest interp: fold
                    # the head's FIRST conv into the level decomposition so
                    # the (B, H, W, nclasses) embedding never hits HBM
                    # (exact, see embed.project_segment_fcn; ~1.3× on the
                    # 256² headline, more at 512² where the embedding is
                    # 268 MB/img). Cluster labels (used only for the first
                    # sample's TB figure) come from a 1-sample embedding.
                    from ganecdotes_tpu.selfsup.embed import (
                        project_segment_fcn,
                    )

                    proj_w = ssl_params["projection"][0]["weight"]
                    nclasses = pre.nclasses

                    @jax.jit
                    def infer(gen_params, seg_params, latents):
                        img, feats = generator_forward(
                            gen_params, meta, [latents], input_is_latent=True,
                            truncation=truncation,
                            truncation_latent=mean_latent,
                            randomize_noise=False, dtype=dtype,
                        )
                        logits = project_segment_fcn(
                            feats, proj_w, seg_params, seg_size, hlen=hlen
                        )
                        z0 = swav_predict_from_features(
                            ssl_params, [f[:1] for f in feats], hlen,
                            nclasses, projn, interp,
                        )
                        return (
                            img,
                            jnp.argmax(logits, axis=-1),
                            jnp.argmax(z0, axis=-1),
                        )

                    return infer

                def embed_one(feats):
                    return swav_predict_from_features(
                        ssl_params, feats, hlen, pre.nclasses, projn, interp
                    )

            else:
                from ganecdotes_tpu.selfsup.simclr import (
                    simclr_predict_from_features,
                    simclr_predict_segment,
                )

                params = pre.params
                hlen = pre.simclr_args["hlen"]
                interp = pre.simclr_args.get("hf_interp", "nearest")

                if not self._seg_is_mlp:
                    # fused inference: per-image BN as axis reductions +
                    # lin2 folded into the head's first layer — the second
                    # full-res 512-wide tensor never exists (427 → 672
                    # img/s at 256² batch 96; exact). Display cluster
                    # labels come from a 1-sample unfused embedding.
                    @jax.jit
                    def infer(gen_params, seg_params, latents):
                        img, feats = generator_forward(
                            gen_params, meta, [latents], input_is_latent=True,
                            truncation=truncation,
                            truncation_latent=mean_latent,
                            randomize_noise=False, dtype=dtype,
                        )
                        logits = simclr_predict_segment(
                            params, feats, seg_params, seg_size, hlen, interp
                        )
                        z0 = simclr_predict_from_features(
                            params, [f[:1] for f in feats], hlen, interp
                        )
                        return (
                            img,
                            jnp.argmax(logits, axis=-1),
                            jnp.argmax(z0, axis=-1),
                        )

                    return infer

                def embed_one(feats):
                    return simclr_predict_from_features(
                        params, feats, hlen, interp
                    )

            # vmap over the batch so the projection heads' BatchNorm sees
            # per-image statistics, exactly like the reference's
            # MAX_TEST_BATCH=1 loop — batching must not couple samples (nor
            # let the ragged-tail duplicate padding skew the stats)
            def embed(gen_params, feats):
                def one(fs):
                    return embed_one([f[None] for f in fs])[0]

                return jax.vmap(one)(feats)

        elif seg_str in ["repurposegan", "datasetgan"]:
            # fused baseline serving: the first head layer is linear in the
            # concat features, so it folds into the level pyramid and the
            # (B, H, W, Σc) concat (~600 MB/img bf16 at 256², hlen 4864)
            # never materializes. Exact (parity-tested vs the unfused
            # pixel_feature_maps forms); the TRAINING path still embeds
            # explicitly (features are fixed there and extracted once).
            n_layers = self.seg_config.n_layers
            if self._seg_is_mlp:
                from ganecdotes_tpu.selfsup.embed import project_feature_maps
                from ganecdotes_tpu.selfsup.heads import (
                    pixel_classifier_from_first,
                )

                state = self.segmentor_state

                @jax.jit
                def infer(gen_params, seg_params, latents):
                    img, feats = generator_forward(
                        gen_params, meta, [latents], input_is_latent=True,
                        truncation=truncation, truncation_latent=mean_latent,
                        randomize_noise=False, dtype=dtype,
                    )
                    v1 = project_feature_maps(
                        feats[:n_layers], seg_params[0]["weight"]
                    )
                    v1 = v1 + seg_params[0]["bias"].astype(v1.dtype)
                    logits = pixel_classifier_from_first(
                        seg_params, state, v1
                    )
                    return img, jnp.argmax(logits, axis=-1)

            else:
                from ganecdotes_tpu.selfsup.embed import concat_segment_fcn

                @jax.jit
                def infer(gen_params, seg_params, latents):
                    img, feats = generator_forward(
                        gen_params, meta, [latents], input_is_latent=True,
                        truncation=truncation, truncation_latent=mean_latent,
                        randomize_noise=False, dtype=dtype,
                    )
                    logits = concat_segment_fcn(
                        feats, seg_params, seg_size, n_layers=n_layers
                    )
                    return img, jnp.argmax(logits, axis=-1)

            return infer

        elif seg_str == "hfc_kmeans":
            # centers and beliefs are device arrays once loaded, so the whole
            # generate→cluster-assign→encode→segment path is one jitted
            # program, same as the other methods (ref host-orchestrates this,
            # baseline/hfc_kmeans/segmentor.py:169-230)
            from ganecdotes_tpu.selfsup.augmentor import group_features_by_block
            from ganecdotes_tpu.selfsup.kmeans import (
                hfc_predict_from_features,
                hfc_segment_fcn,
            )

            pre = self.preprocessor
            pre.ensure_loaded()
            # trained_beliefs may still be None here (train mode before
            # fitting): hfc_predict_from_features then estimates them from
            # the batch in-graph (region_beliefs_device), so this method ×
            # mode combination keeps the one-program design too
            n_layers = pre.perturb_config["n_layers"]
            centers = [jnp.asarray(c) for c in pre.hfc_model.centers[:n_layers]]
            cpl = list(pre.hfc_model.clusters_per_layer)
            out_size = pre.hfc_model.out_size
            hier = pre.hier_encode
            beliefs = pre.trained_beliefs
            p_trunc = pre.perturb_config["truncation"]
            # the preprocessor's OWN mean-latent estimate (different key
            # stream than the pipeline's): the clusterers/beliefs/head were
            # all fitted on features anchored to it
            pre_mean = pre.mean_latent
            n_latent = meta["n_latent"]

            @jax.jit
            def infer(gen_params, seg_params, latents):
                # replicate HFCPreprocessor._w_plus + _grouped_features
                w = pre_mean + p_trunc * (latents - pre_mean)
                w_plus = jnp.repeat(w[:, None, :], n_latent, axis=1)
                _, feats = generator_forward(
                    gen_params, meta, [w_plus], input_is_latent=True,
                    truncation=p_trunc, truncation_latent=pre_mean,
                    randomize_noise=False, dtype=dtype,
                )
                # concat=False: groups stay as channel-part tuples; the
                # kmeans assignment distributes over the split and the
                # per-level concat copies never reach HBM
                groups = group_features_by_block(
                    feats, skip_const=True, concat=False
                )
                if hier:
                    # belief propagation re-argmaxes at full resolution
                    # between matmuls (nonlinear) — unfusable as-is
                    z, _ = hfc_predict_from_features(
                        groups[:n_layers], centers, cpl, out_size, hier,
                        beliefs,
                    )
                    logits = one_shot_segmentor_apply(seg_params, z, seg_size)
                else:
                    # flat encoding is layerwise-affine in the one-hot maps:
                    # fuse the first head conv into the level pyramid
                    # (kmeans.hfc_segment_fcn — parity-tested exact)
                    logits, _ = hfc_segment_fcn(
                        groups[:n_layers], centers, cpl, out_size,
                        seg_params, seg_size,
                    )
                # the displayed image uses the model config's truncation,
                # exactly like get_image_from_latent
                img, _ = generator_forward(
                    gen_params, meta, [latents], input_is_latent=True,
                    truncation=truncation, truncation_latent=mean_latent,
                    randomize_noise=False, dtype=dtype,
                )
                return img, jnp.argmax(logits, axis=-1)

            return infer

        is_mlp = self._seg_is_mlp
        state = self.segmentor_state if is_mlp else None
        is_ssl = "hfc_with_swav" in seg_str or seg_str == "hfc_with_simclr"

        @jax.jit
        def infer(gen_params, seg_params, latents):
            img, feats = generator_forward(
                gen_params, meta, [latents], input_is_latent=True,
                truncation=truncation, truncation_latent=mean_latent,
                randomize_noise=False, dtype=dtype,
            )
            z = embed(gen_params, feats)
            if is_mlp:
                logits, _ = pixel_classifier_apply(
                    seg_params, state, z, train=False
                )
            else:
                logits = one_shot_segmentor_apply(seg_params, z, seg_size)
            pred = jnp.argmax(logits, axis=-1)
            if is_ssl:
                # hard cluster assignments, the reference's out_labels
                # (swav_clustering.py:659-693) — logged per test batch
                return img, pred, jnp.argmax(z, axis=-1)
            return img, pred

        return infer

    def _save_test_pred_figure(self, img01, cluster01, bs):
        """Cluster-map + image side-by-side figure (ref :647-656)."""
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        plt.figure()
        plt.subplot(121)
        plt.imshow(cluster01, cmap="jet")
        plt.subplot(122)
        plt.imshow(np.clip(img01 * 0.5 + 0.5, 0, 1))
        plt.savefig(os.path.join(self.out_dir, f"test_pred_{bs}.png"))
        plt.close()

    def _save_demo_collage(self, ims):
        """tester='demo': one-shot sample + all test predictions in one
        2×(n+1) grid (ref :834-879)."""
        size = self.model_config.image_size
        one_shot_in = self.one_shot_latent
        if one_shot_in.ndim == 1:
            one_shot_in = one_shot_in[None]
        input_im = np.asarray(
            resize_nearest(
                jnp.asarray(self.get_image_from_latent(one_shot_in)),
                size,
            )
        )[0]
        # create_pil_collage min/max-normalizes non-uint8 inputs itself
        disp_in = np.clip(input_im, -1, 1)
        one_shot_mask = np.asarray(
            resize_nearest(
                jnp.asarray(self.one_shot_label)[..., None].astype(jnp.float32),
                size,
            )
        )[0, :, :, 0].astype(np.int64)
        mask_in = np.uint8(
            visualize_label_mask(one_shot_mask, self.color_map) * 255
        )

        row_ims, row_preds = [], []
        for im, pred in zip(ims[0], ims[2]):
            row_ims.append(np.clip(im, -1, 1))
            row_preds.append(
                np.uint8(visualize_label_mask(pred, self.color_map) * 255)
            )

        n = len(row_ims)
        create_pil_collage(
            [disp_in] + row_ims + [mask_in] + row_preds,
            os.path.join(self.test_dir, "demo.png"),
            (2, n + 1),
        )

    def run_tests(self):
        """Batched test block + metrics (ref :595-885)."""
        self.test_dir = os.path.join(self.out_dir, "tests")
        self.test_img_dir = os.path.join(self.test_dir, "images")
        os.makedirs(self.test_img_dir, exist_ok=True)

        infer = self._make_infer_fn()
        is_ssl = (
            "hfc_with_swav" in self.seg_str or self.seg_str == "hfc_with_simclr"
        )

        # multi-chip: shard the test batch over the mesh's data axis with
        # replicated params, so data-parallel inference is THE pipeline code
        # path (SURVEY §2 parallelism inventory), not a separate one. The
        # per-step batch is device_count × per-device chunk.
        batch = MAX_TEST_BATCH
        n_dev = jax.device_count()
        if n_dev > 1 and hasattr(infer, "lower"):
            from ganecdotes_tpu.parallel.mesh import batch_shardings, make_mesh

            mesh = make_mesh()
            repl, shard = batch_shardings(mesh)
            batch = n_dev * max(1, MAX_TEST_BATCH // n_dev)
            # shard only the batch-sized outputs: the fused swav path also
            # returns a 1-sample cluster map, which must stay replicated
            out_struct = jax.eval_shape(
                infer, self.model.params, self.segmentor_params,
                jnp.zeros((batch, self.test_latents.shape[-1]),
                          self.test_latents.dtype),
            )
            out_shardings = jax.tree.map(
                lambda s: shard if s.shape and s.shape[0] == batch else repl,
                out_struct,
            )
            infer = jax.jit(
                infer, in_shardings=(repl, repl, shard),
                out_shardings=out_shardings,
            )

        pred_labels = []
        test_images = []
        inference_times = []
        n = self.num_test_samples
        for bs in range(0, n, batch):
            t0 = time.time()
            chunk_lat = self.test_latents[bs : bs + batch]
            pad = batch - chunk_lat.shape[0]
            if pad > 0:  # pad the ragged tail so one compilation serves all
                chunk_lat = np.concatenate(
                    [chunk_lat, np.repeat(chunk_lat[-1:], pad, axis=0)], 0
                )
            latents = jnp.asarray(chunk_lat)
            out = infer(self.model.params, self.segmentor_params, latents)
            img, pred = out[0], out[1]
            pred = jax.block_until_ready(pred)
            inference_times.append(time.time() - t0)
            pred_labels.append(np.asarray(pred))
            # bf16 inference: metrics/collages run on host float32
            test_images.append(np.asarray(img, dtype=np.float32))

            # per-batch artifacts, as the reference's test loop (:636-668):
            # cluster-map figure + TensorBoard images
            img0 = np.asarray(img[0], dtype=np.float32)
            img0 = img0 / max(float(np.abs(img0).max()), 1e-12)
            if is_ssl:
                cluster0 = np.asarray(out[2][0], dtype=np.float32)
                cluster0 = cluster0 / max(float(cluster0.max()), 1e-12)
                self._save_test_pred_figure(img0, cluster0, bs)
                self.summary_writer.add_image(
                    "one_shot/test_image", np.clip(img0 * 0.5 + 0.5, 0, 1),
                    step=bs, dataformats="HWC",
                )
                self.summary_writer.add_image(
                    "one_shot/swav_output", cluster0, step=bs,
                    dataformats="HW" if cluster0.ndim == 2 else "HWC",
                )
            pred0 = np.asarray(pred[0], dtype=np.float32)
            self.summary_writer.add_image(
                "one_shot/predictions",
                pred0 / max(float(pred0.max()), 1.0),
                step=bs, dataformats="HW",
            )

        pred_labels = np.concatenate(pred_labels, axis=0)[:n]
        test_images = np.concatenate(test_images, axis=0)[:n]

        np.save(os.path.join(self.test_dir, "label_predictions.npy"), pred_labels)

        size = self.model_config.image_size
        results = {}
        classes = self.model_config.classes
        ims = [[], [], []]

        for i in range(n):
            input_im = np.asarray(
                resize_nearest(jnp.asarray(test_images[i : i + 1]), size)
            )[0]
            gt_mask = np.asarray(
                resize_nearest(
                    jnp.asarray(
                        self.test_labels[i : i + 1, :, :, None].astype(np.float32)
                    ),
                    size,
                )
            )[0, :, :, 0].astype(np.int64)
            pred_mask = np.asarray(
                resize_nearest(
                    jnp.asarray(pred_labels[i : i + 1, :, :, None].astype(np.float32)),
                    size,
                )
            )[0, :, :, 0].astype(np.int64)

            # create_pil_collage min/max-normalizes non-uint8 inputs
            disp8 = np.clip(input_im, -1, 1)
            create_pil_collage(
                [
                    disp8,
                    np.uint8(visualize_label_mask(gt_mask, self.color_map) * 255),
                    np.uint8(visualize_label_mask(pred_mask, self.color_map) * 255),
                ],
                os.path.join(self.test_img_dir, f"sample_{i}_pred.png"),
            )
            # foreground-only collage (ref :711-726)
            create_pil_collage(
                [
                    disp8,
                    np.uint8(
                        visualize_label_mask(
                            (gt_mask > 0).astype(np.int64), self.color_map
                        ) * 255
                    ),
                    np.uint8(
                        visualize_label_mask(
                            (pred_mask > 0).astype(np.int64), self.color_map
                        ) * 255
                    ),
                ],
                os.path.join(self.test_img_dir, f"sample_{i}_pred_fg.png"),
            )

            ims[0].append(input_im)
            ims[1].append(gt_mask)
            ims[2].append(pred_mask)

            # 'iou_vs_pd' needs the per-class IoU table too (the reference
            # gates it on ['iou_vs_pd','all'] at :808 but forgets to build
            # mask_iou_pd outside 'iou'/'all' — intended semantics here)
            if self.test_str in ["iou", "all", "iou_vs_pd"]:
                mask_iou = {
                    c: get_mask_iou(gt_mask, pred_mask, k)
                    for k, c in enumerate(classes)
                }
                bb_iou = {
                    c: get_bb_iou(gt_mask, pred_mask, k)
                    for k, c in enumerate(classes)
                }
                w_iou = get_weighted_iou(gt_mask, mask_iou, classes)
                results.setdefault("mask_iou", []).append(mask_iou)
                results.setdefault("bb_iou", []).append(bb_iou)
                results.setdefault("w_iou", []).append(w_iou)
                results["bin_iou"] = get_bin_iou(gt_mask, pred_mask)

            if self.test_str in ["dice", "all"]:
                results.setdefault("mask_dice", []).append(
                    {c: get_mask_dice(gt_mask, pred_mask, k)
                     for k, c in enumerate(classes)}
                )
                results.setdefault("bb_dice", []).append(
                    {c: get_bb_dice(gt_mask, pred_mask, k)
                     for k, c in enumerate(classes)}
                )

        if self.test_str in ["iou", "all", "iou_vs_pd"]:
            import pandas as pd

            mask_iou_pd = pd.DataFrame(
                data=np.array(
                    [[s[k] for k in classes] for s in results["mask_iou"]]
                ),
                columns=classes,
            )
            bb_iou_pd = pd.DataFrame(
                data=np.array([[s[k] for k in classes] for s in results["bb_iou"]]),
                columns=classes,
            )
            if self.test_str in ["iou", "all"]:
                mask_iou_pd.to_csv(
                    os.path.join(self.test_dir, "mask_iou_results.csv")
                )
                bb_iou_pd.to_csv(
                    os.path.join(self.test_dir, "bb_iou_results.csv")
                )

                self.logger.info(
                    "\nMask IoU Results:\n" + str(mask_iou_pd.mean(axis=0))
                )
                self.mean_mask_iou = float(mask_iou_pd.mean(axis=0).mean())
                self.logger.info(f"\nMean Mask IoU:\n{self.mean_mask_iou}")
                self.logger.info(
                    f"\nWeighted IoU Results:\n{np.mean(results['w_iou'])}"
                )
                self.logger.info(f"FG IoU: {results['bin_iou']}")

        self.mean_inference_time = float(np.mean(inference_times))
        self.logger.info(f"Mean Inference Time: {self.mean_inference_time}")

        if self.test_str in ["iou_vs_pd", "all"]:
            pd_scores = get_pd_at_iou_threshold(mask_iou_pd, classes, 0.5)
            results["pd"] = pd_scores
            self.logger.info("Mean PD at IoU=0.5:")
            for k, v in pd_scores.items():
                self.logger.info(f"{k}: \t{v}")
            self.logger.info(
                f"Mean PD:{np.mean([v for v in pd_scores.values()])}"
            )
            curve = get_iou_vs_pd_curve(mask_iou_pd, classes)
            results["iou_pd_curve"] = curve
            plot_iou_vs_pd_curve(
                curve, classes + ["Mean"],
                os.path.join(self.test_dir, "iou_vs_pd_curve.png"),
                self.model_str,
            )

        if self.test_str == "demo":
            self._save_demo_collage(ims)

        np.savez_compressed(
            os.path.join(self.test_dir, "results.npz"),
            **{k: np.asarray(v, dtype=object) for k, v in results.items()},
        )
        return results


class _TensorBoardShim:
    """Scalar/image logging without a hard tensorboard dependency.

    Uses torch's SummaryWriter when available (parity with the reference's
    TB artifacts), else records to an in-memory dict.
    """

    def __init__(self, log_dir):
        self.log_dir = log_dir
        self.records = {}
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            os.makedirs(log_dir, exist_ok=True)
            self._writer = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def add_scalar(self, tag, value, step=None):
        self.records.setdefault(tag, []).append((step, float(value)))
        if self._writer:
            self._writer.add_scalar(tag, value, step)

    def add_image(self, tag, img, step=None, dataformats=None):
        self.records.setdefault(tag, []).append((step, np.asarray(img).shape))
        if self._writer:
            img = np.asarray(img)
            if dataformats is None:
                # every internal call site passes dataformats explicitly
                # (audited: 3× one_shot_pipeline, 1× swav.py); this default
                # only serves external users, who are NHWC in this
                # framework — no CHW guessing
                dataformats = "HW" if img.ndim == 2 else "HWC"
            self._writer.add_image(tag, img, step, dataformats=dataformats)
