"""FID (Frechet Inception Distance) between two image folders.

Parity: reference fid.py (root, :12-18, pyiqa one-shot) and
scripts/metrics FID trio. pyiqa and InceptionV3 weights are not available
in this zero-egress image, so the Inception feature extractor loads from a
user-supplied torchvision inception_v3 .pth; the Frechet distance and
folder protocol are self-contained.
"""

import glob
import os

import numpy as np
from scipy import linalg


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """Standard FID: ||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2))."""
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm(
            (sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def activation_statistics(feats):
    mu = np.mean(feats, axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def calculate_fid_folders(dir1, dir2, feature_fn, batch=8, size=299):
    """feature_fn: (N, size, size, 3) float [0,1] -> (N, D) features.

    Use metrics.inception.load_inception_feature_fn(pth) to build one
    from torchvision inception_v3 weights.
    """
    import cv2

    def feats_of(d):
        paths = sorted(glob.glob(os.path.join(d, "**", "*.png"),
                                 recursive=True))
        out = []
        for s in range(0, len(paths), batch):
            imgs = []
            for p in paths[s:s + batch]:
                img = cv2.imread(p)[:, :, ::-1]
                img = cv2.resize(img, (size, size),
                                 interpolation=cv2.INTER_LINEAR)
                imgs.append(img.astype(np.float32) / 255.0)
            out.append(np.asarray(feature_fn(np.stack(imgs))))
        return np.concatenate(out, axis=0)

    m1, s1 = activation_statistics(feats_of(dir1))
    m2, s2 = activation_statistics(feats_of(dir2))
    return frechet_distance(m1, s1, m2, s2)
