import numpy as np

def peak_signal_noise_ratio(image_true, image_test, data_range=None):
    if data_range is None:
        data_range = 255
    err = np.mean((image_true.astype(np.float64) - image_test.astype(np.float64)) ** 2)
    return 10 * np.log10((data_range ** 2) / err)

def structural_similarity(im1, im2, win_size=7, multichannel=False, data_range=None):
    # uniform-filter SSIM, skimage-compatible constants
    from scipy.ndimage import uniform_filter
    if data_range is None:
        data_range = 255
    im1 = im1.astype(np.float64); im2 = im2.astype(np.float64)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2; C2 = (K2 * data_range) ** 2
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)
    ux = uniform_filter(im1, size=win_size)
    uy = uniform_filter(im2, size=win_size)
    uxx = uniform_filter(im1 * im1, size=win_size)
    uyy = uniform_filter(im2 * im2, size=win_size)
    uxy = uniform_filter(im1 * im2, size=win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    pad = (win_size - 1) // 2
    return S[pad:-pad, pad:-pad].mean()
