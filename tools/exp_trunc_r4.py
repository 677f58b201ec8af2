"""Round-4 experiment: energy-bounded window truncation at 2048^2 (REJECTED).

Measures the window-energy fraction dropped by shrinking the zoom-DFT
window w=1032 -> w' for every representative quadrupole source shift.
Result (/tmp/trunc_study.log, full table reproduced in ROADMAP.md item 2):
the worst point drops 1.4e-6 of its energy already at w'=1024 (0.8% FLOP
saving); 1.6e-4 at 968; up to 1.4e-2 at 768 (off-axis points lose whole
diffraction orders). Field error ~ sqrt(dropped) — truncation cannot hold
the <=1e-6 contract at any FLOP-relevant w'.
"""
import numpy as np

# demo bars at 2048^2: 4 bars of width n/16 at pitch 9/64*n (scaled from 64^2: 4px bars, 9px pitch)
n = 2048
geom = np.zeros((n, n), np.float32)
scale = n // 64
for b in range(4):
    c0 = (18 + 9 * b) * scale  # reference demo: bars at columns 18,27,36,45 width 4
    geom[:, c0:c0 + 4 * scale] = 1.0

# centered spectrum (fftshift convention like the repo: k in [-2,2))
spec = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(geom))).astype(np.complex128)

# pupil disk: sigma grid [-2,2), r<=1 => radius n/4 px around center
iy, ix = np.mgrid[0:n, 0:n]
r2 = ((iy - n//2)**2 + (ix - n//2)**2)
disk = (r2 <= (n//4)**2)

w_full = min(n, ((n//2 + 3 + 7)//8)*8)  # 1032
lo = n//4 - 1

# quadrupole sigma 0.4/0.8 shifts: sample a few extreme + representative points
sig = 4.0/n  # deltaSigma
# source ring radius in px: sigma_out 0.8 -> 0.8/(4/n) = 0.2n = 409.6
angles = np.linspace(0, 2*np.pi, 16, endpoint=False)
shifts = []
for rad in (0.4/ (4.0/n), 0.8/(4.0/n)):
    for a in angles:
        shifts.append((int(round(rad*np.sin(a))), int(round(rad*np.cos(a)))))
shifts.append((0,0))

def window_energy(s, w):
    # product X = roll(P, s) * M ; support = disk shifted by s (rows+s0, cols+s1)
    # window at (lo+s) clipped like the engine
    r0 = min(max(lo + s[0], 0), n - w)
    c0 = min(max(lo + s[1], 0), n - w)
    dmask = np.zeros((n,n), bool)
    # shifted disk: center moves to n/2 + s
    d2 = ((iy - n//2 - s[0])**2 + (ix - n//2 - s[1])**2)
    dmask = d2 <= (n//4)**2
    prod_e = (np.abs(spec)**2) * dmask
    total = prod_e.sum()
    inwin = prod_e[r0:r0+w, c0:c0+w].sum()
    return total, inwin

print("shift  total_energy  dropped_frac(w=1032)  dropped(w'=1024,968,904,832,768)")
worst = {}
for s in shifts:
    total, _ = window_energy(s, w_full)
    row = []
    for w in (1032, 1024, 968, 904, 832, 768):
        t, inw = window_energy(s, w)
        row.append(1 - inw/max(t,1e-300))
    key = tuple(np.round(row, 12))
    print(s, f"{total:.3e}", " ".join(f"{x:.2e}" for x in row))
