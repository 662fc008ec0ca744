"""Quality evaluation: FID and reconstruction metrics.

The reference repo reports FID only in the paper, not the code
(README.md:2, SURVEY.md §6). This module provides the full FID
machinery so trained models can be scored:

  fid = ||mu_r - mu_f||^2 + Tr(S_r + S_f - 2 (S_r S_f)^{1/2})

The standard extractor is torchvision InceptionV3 pool3 features
(2048-d). This environment has no network access, so the extractor
takes a LOCAL state-dict path; without one you can still pass any
callable `images -> features` (e.g. our trained classifier's feature
head) — useful for relative tracking, NOT comparable to published FID.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray,
                                                      np.ndarray]:
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians (the FID formula)."""
    import scipy.linalg

    def _sqrtm(m):
        out = scipy.linalg.sqrtm(m, disp=False)
        return out[0] if isinstance(out, tuple) else out  # scipy API drift

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = _sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def fid_from_features(real_features, fake_features) -> float:
    mu_r, s_r = compute_statistics(real_features)
    mu_f, s_f = compute_statistics(fake_features)
    return frechet_distance(mu_r, s_r, mu_f, s_f)


def compute_fid(real_images: np.ndarray, fake_images: np.ndarray,
                extractor: Callable[[np.ndarray], np.ndarray],
                batch_size: int = 64) -> float:
    """images: [N,H,W,3] in [-1,1]; extractor maps a batch to [n,d]."""
    def run(images):
        feats = []
        for i in range(0, len(images), batch_size):
            feats.append(np.asarray(extractor(images[i:i + batch_size])))
        return np.concatenate(feats, axis=0)
    return fid_from_features(run(real_images), run(fake_images))


def inception_extractor(weights_path: Optional[str] = None,
                        device: str = 'cpu'):
    """torchvision InceptionV3 pool3 (2048-d) feature extractor.

    `weights_path`: local state-dict file (pth). Required for
    paper-comparable FID; this image has no network egress to fetch the
    canonical weights, so None raises with instructions.
    """
    if weights_path is None:
        raise ValueError(
            'FID needs the InceptionV3 weights. Download '
            'inception_v3_google-*.pth where you have network access '
            'and pass weights_path.')
    import torch
    import torchvision  # not in the base image; needs the weights anyway
    model = torchvision.models.inception_v3(weights=None, aux_logits=True,
                                            init_weights=False)
    state = torch.load(weights_path, map_location=device)
    model.load_state_dict(state)
    model.fc = torch.nn.Identity()
    model.eval().to(device)

    @torch.no_grad()
    def extract(images: np.ndarray) -> np.ndarray:
        # [-1,1] NHWC -> inception input 299x299, imagenet normalization
        x = torch.from_numpy(np.asarray(images, np.float32))
        x = x.permute(0, 3, 1, 2).to(device)
        x = torch.nn.functional.interpolate(
            x, size=(299, 299), mode='bilinear', align_corners=False)
        x = (x + 1.0) / 2.0
        mean = torch.tensor([0.485, 0.456, 0.406], device=device)
        std = torch.tensor([0.229, 0.224, 0.225], device=device)
        x = (x - mean[None, :, None, None]) / std[None, :, None, None]
        return model(x).cpu().numpy()

    return extract


def classifier_extractor(nets, params, aux):
    """In-environment feature extractor: the trained AC-GAN classifier's
    768-d penultimate features (spatial mean of the last MRU state, the
    input to its class head — models/classifier.py).

    Gives an FID-style score obtainable on THIS machine after a training
    run, without torchvision/network access. Clearly labeled: numbers
    are for RELATIVE tracking between checkpoints of the same run and
    are NOT comparable to published InceptionV3 FID.

    Usage:
        ext = classifier_extractor(nets, state.params, state.aux)
        fid_like = compute_fid(real_photos, fake_photos, ext)
    """
    import jax

    if nets.classifier is None:
        raise ValueError('classifier_extractor needs a multiclass model '
                         '(the classifier is only built when '
                         'multiclasses=True)')

    @jax.jit
    def features(images):
        _, _, _, feat = nets.classifier.apply(
            {'params': params['D2'], **aux['D2']}, images,
            return_features=True)
        return feat

    def extract(images: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp
        return np.asarray(features(jnp.asarray(images, jnp.float32)))

    return extract


def pinned_extractor(npz_path: str):
    """Cross-run pinned classifier-FID extractor (round 5).

    Loads the dedicated classifier trained once by
    scripts/train_fid_extractor.py (fixed seed/recipe, saved as
    `<npz_path>` + a `<npz_path>.json` metadata sidecar) and returns an
    `images -> [n, 768]` feature callable. Every eval scored through
    this extractor lives in the SAME feature space, so classifier-FID
    numbers are comparable across runs and rounds — unlike the per-run
    extractor (each run's own last checkpoint), which is only valid for
    within-run trajectories.
    """
    import json
    import os

    import jax

    from .core.config import Config
    from .train import Networks

    with open(npz_path + '.json') as f:
        meta = json.load(f)

    def nest(flat):
        out = {}
        for key, v in flat.items():
            parts = key.split('/')
            d = out
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = (np.asarray(v, np.float32)
                            if v.dtype == np.float16 else np.asarray(v))
        return out

    if not os.path.exists(npz_path):
        raise FileNotFoundError(
            f'{npz_path} not found — train it once with '
            'scripts/train_fid_extractor.py')
    with np.load(npz_path) as z:
        tree = nest({k: z[k] for k in z.files})
    cfg = Config(**meta['config']).derive('train')
    nets = Networks(cfg)
    native_hw = (cfg.output_height, cfg.output_width // 2)  # photo half

    @jax.jit
    def features(images):
        if images.shape[1:3] != native_hw:
            # e.g. 128x128 halves from the hires config: resize to the
            # extractor's native input so every run scores in ONE space
            from .ops.resize import resize
            images = resize(images, native_hw)
        _, _, _, feat = nets.classifier.apply(
            {'params': tree['params'], **tree['aux']}, images,
            return_features=True)
        return feat

    def extract(images: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp
        return np.asarray(features(jnp.asarray(images, jnp.float32)))

    return extract


def reconstruction_metrics(a: np.ndarray, b: np.ndarray) -> dict:
    """L1 / L2 / PSNR between two [-1,1] image batches."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    return {
        'l1': float(np.mean(np.abs(a - b))),
        'mse': mse,
        'psnr_db': float('inf') if mse == 0
        else 20 * np.log10(2.0 / np.sqrt(mse)),
    }
