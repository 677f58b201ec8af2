"""Thick-mask (Mask-3D) effects: the boundary-layer model.

The reference (and this framework's default path) treats the mask as an
infinitely thin Kirchhoff screen — transmission is the drawn layout
(``/root/reference/mask.py:42-59`` builds the spectrum straight from the
geometry). Real masks are ~70 nm of absorber on glass: near feature edges
the field is perturbed by the topography, which at hyper-NA shows up as
orientation-dependent CD bias (H-V bias), pattern-shift, and a best-focus
shift that the thin-mask model cannot produce.

The industry-standard cheap correction is the *boundary layer* (BL) model
(Tirapu-Azpiroz & Yablonovitch, JOSA A 23, 2006): augment the thin-mask
transmission with thin strips of complex transmission along every feature
edge, with different strip parameters for horizontal and vertical edges.
Rigorous solvers (FDTD/RCWA) are used once to fit the strip width and
complex amplitude; imaging then stays fully Fourier-optical.

TPU-native formulation: on an n x n transmission grid with pixel size p, a
strip of physical width w and added complex amplitude beta along an edge is
an added field of ``beta * (w / p)`` on the edge pixels. Edge positions and
strengths come from first differences of the (possibly complex) geometry —
pure elementwise/roll work that fuses into the surrounding spectrum FFT, is
exactly zero away from edges, and is differentiable w.r.t. both the mask
and the BL parameters. The model is therefore usable in three ways:

- forward: ``apply_boundary_layers`` -> effective complex mask, consumed by
  every imaging path (Abbe / SOCS / vector / tiled) unchanged;
- inverse: SMO/OPC *through* the BL model corrects the layout for thick-
  mask effects (M3D-aware OPC);
- calibration: :func:`fit_boundary_layer` recovers (beta_h, beta_v) from a
  reference aerial image by gradient descent (the analog of
  :func:`..optimize.fit_aberrations` for the mask stack).

Edge-orientation convention: a VERTICAL edge runs along the row axis
(transmission changes along axis 1); ``beta_v`` scales vertical-edge
strips, ``beta_h`` horizontal-edge strips. ``beta_h == beta_v`` recovers an
isotropic model; ``width_nm == 0`` or ``beta == 0`` recovers thin-mask
exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OpticsConfig

_EPS = 1e-20  # smooths |diff| at exactly-flat regions so mask grads stay finite


@dataclasses.dataclass(frozen=True)
class BoundaryLayer:
    """Static BL parameters (hashable: usable as a jit-static cache key).

    width_nm: physical strip width (per edge side, total added amplitude per
        unit edge length is ``beta * width_nm``).
    beta_h / beta_v: complex added transmission of horizontal- / vertical-
        edge strips. Real part biases CD; imaginary part produces the
        thick-mask best-focus shift and pattern asymmetry through focus.
    """

    width_nm: float = 8.0
    beta_h: complex = 0.0
    beta_v: complex = 0.0
    # oblique-incidence (EUV chief-ray shadowing) asymmetry: rising /
    # falling edges carry beta +- asym (see edge_fields_signed) — the
    # mechanism behind the thick-mask pattern shift. 0 = symmetric model.
    beta_h_asym: complex = 0.0
    beta_v_asym: complex = 0.0

    def apply(self, geometry: jnp.ndarray, config: OpticsConfig) -> jnp.ndarray:
        return apply_boundary_layers(
            geometry, config,
            width_nm=self.width_nm, beta_h=self.beta_h, beta_v=self.beta_v,
            beta_h_asym=self.beta_h_asym, beta_v_asym=self.beta_v_asym)


def _safe_abs(d: jnp.ndarray) -> jnp.ndarray:
    if jnp.issubdtype(d.dtype, jnp.complexfloating):
        return jnp.sqrt(d.real**2 + d.imag**2 + _EPS)
    return jnp.sqrt(d * d + _EPS)


def edge_fields(geometry: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(E_h, E_v) edge-strength maps: each unit transmission step contributes
    total weight 1 per edge, split 1/2-1/2 onto the two pixels flanking it.

    Works on continuous (SMO/OPC sigmoid) and complex (PSM) masks alike —
    strengths are |first difference| magnitudes. Periodic (roll) boundary
    handling matches the FFT spectrum's own periodicity; on the tiled path
    the wraparound pixels land in the discarded halo.
    """
    g = jnp.asarray(geometry)
    d0 = _safe_abs(g - jnp.roll(g, 1, axis=0))  # steps along rows
    d1 = _safe_abs(g - jnp.roll(g, 1, axis=1))  # steps along columns
    e_h = 0.5 * (d0 + jnp.roll(d0, -1, axis=0))
    e_v = 0.5 * (d1 + jnp.roll(d1, -1, axis=1))
    return e_h, e_v


def edge_fields_signed(
    geometry: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """:func:`edge_fields` split by step direction: ``(E_h_rise, E_h_fall,
    E_v_rise, E_v_fall)`` where *rise* means transmission MAGNITUDE
    increasing along the +axis direction (dark-to-bright going down/right).
    ``rise + fall`` recovers :func:`edge_fields` (to 1 ulp). The split is
    what oblique-incidence (EUV chief-ray) shadowing physics needs: the
    illuminated and shadowed sides of a feature are different edges, so
    their boundary strips carry different amplitudes — which is exactly a
    pattern shift, the signature thick-mask EUV effect. Phase-only steps
    (alternating PSM) have no magnitude direction and split evenly."""
    g = jnp.asarray(geometry)
    # Direction is by |t| for REAL dtypes too: a real alternating PSM stores
    # the pi phase as a sign, and a +1 -> -1 step has no magnitude direction
    # (must split evenly), while a 0 -> -1 step is a RISE in |t|.
    mag = _safe_abs(g)
    d0 = _safe_abs(g - jnp.roll(g, 1, axis=0))
    d1 = _safe_abs(g - jnp.roll(g, 1, axis=1))
    s0 = mag - jnp.roll(mag, 1, axis=0)
    s1 = mag - jnp.roll(mag, 1, axis=1)
    rise0, fall0 = 0.5 * (d0 + s0), 0.5 * (d0 - s0)
    rise1, fall1 = 0.5 * (d1 + s1), 0.5 * (d1 - s1)

    def split(d, axis):
        return 0.5 * (d + jnp.roll(d, -1, axis=axis))

    return split(rise0, 0), split(fall0, 0), split(rise1, 1), split(fall1, 1)


def _static_zero(beta) -> bool:
    """True only for a literal Python zero (not a traced value)."""
    return isinstance(beta, (int, float, complex)) and complex(beta) == 0.0


def apply_boundary_layers(
    geometry: jnp.ndarray,
    config: OpticsConfig,
    *,
    width_nm,
    beta_h,
    beta_v,
    beta_h_asym=0.0,
    beta_v_asym=0.0,
) -> jnp.ndarray:
    """Effective complex transmission with BL strips added along edges.

    ``width_nm`` / ``beta_h`` / ``beta_v`` may be Python scalars (static,
    the common forward path) or traced JAX scalars (the calibration path
    differentiates through them). Complex arithmetic — run under jit on the
    TPU tunnel (CLAUDE.md), as all callers here do.
    """
    g = jnp.asarray(geometry)
    scale = jnp.asarray(width_nm, jnp.float32) / jnp.float32(config.pixel_size)
    if _static_zero(beta_h_asym) and _static_zero(beta_v_asym):
        # symmetric model (the common path — unchanged arithmetic)
        e_h, e_v = edge_fields(g)
        pert = scale * (jnp.asarray(beta_h, jnp.complex64) * e_h
                        + jnp.asarray(beta_v, jnp.complex64) * e_v)
        return g.astype(jnp.complex64) + pert
    # asymmetric model (oblique-incidence shadowing): rising and falling
    # edges carry beta +- asym respectively
    e_hr, e_hf, e_vr, e_vf = edge_fields_signed(g)
    bh = jnp.asarray(beta_h, jnp.complex64)
    bv = jnp.asarray(beta_v, jnp.complex64)
    bha = jnp.asarray(beta_h_asym, jnp.complex64)
    bva = jnp.asarray(beta_v_asym, jnp.complex64)
    pert = scale * ((bh + bha) * e_hr + (bh - bha) * e_hf
                    + (bv + bva) * e_vr + (bv - bva) * e_vf)
    return g.astype(jnp.complex64) + pert


@dataclasses.dataclass(frozen=True)
class EdgeKernelM3D:
    """Generalized (multi-tap) thick-mask edge model — the "wide boundary
    layer". :class:`BoundaryLayer` is the K=0 special case.

    Each edge ORIENTATION (h/v) and step DIRECTION (rise/fall by
    transmission magnitude, :func:`edge_fields_signed`) carries its own
    complex tap vector over pixel offsets −K..K along the step axis; the
    added field is ``(width_nm / pixel_size) · Σ_o taps[o] ·
    shift_o(edge strips)``. Hashable (jit-static), consumed by every
    imaging path through the same ``.apply`` duck type as BoundaryLayer.

    Why it exists: at EUV the absorber is ~4.4λ tall, so the rigorous
    reflected near field differs from the thin mask over SEVERAL pixels
    around each edge and strongly by side (chief-ray shadowing). On the
    6° rigorous fixture the 1-px BoundaryLayer floors at ~11% image NRMS;
    K=1 reaches ~1.2% and K=2 ~0.1% (tests/test_mask3d.py,
    tests/test_rcwa.py)."""

    width_nm: float = 8.0
    taps_h_rise: tuple = (0j,)
    taps_h_fall: tuple = (0j,)
    taps_v_rise: tuple = (0j,)
    taps_v_fall: tuple = (0j,)

    def __post_init__(self):
        lens = {len(self.taps_h_rise), len(self.taps_h_fall),
                len(self.taps_v_rise), len(self.taps_v_fall)}
        if len(lens) != 1 or (next(iter(lens)) % 2) == 0:
            raise ValueError("tap vectors must share one odd length")

    @property
    def k(self) -> int:
        return (len(self.taps_v_rise) - 1) // 2

    def apply(self, geometry: jnp.ndarray, config: OpticsConfig) -> jnp.ndarray:
        return apply_edge_kernel(
            geometry, config, width_nm=self.width_nm,
            taps_h_rise=self.taps_h_rise, taps_h_fall=self.taps_h_fall,
            taps_v_rise=self.taps_v_rise, taps_v_fall=self.taps_v_fall)


def apply_edge_kernel(
    geometry: jnp.ndarray,
    config: OpticsConfig,
    *,
    width_nm,
    taps_h_rise,
    taps_h_fall,
    taps_v_rise,
    taps_v_fall,
) -> jnp.ndarray:
    """Effective complex transmission under the multi-tap edge model. Tap
    vectors may be tuples of Python complex (static) or traced complex
    arrays (the calibration path); the tap count is trace-static either
    way. Offsets run along the step axis (vertical edges shift along x,
    horizontal along y); complex math — run under jit on the tunnel."""
    g = jnp.asarray(geometry)
    e_hr, e_hf, e_vr, e_vf = edge_fields_signed(g)
    scale = jnp.asarray(width_nm, jnp.float32) / jnp.float32(config.pixel_size)

    def conv(field, taps, axis):
        k = (len(taps) - 1) // 2
        out = jnp.zeros_like(g, dtype=jnp.complex64)
        for i, off in enumerate(range(-k, k + 1)):
            tap = jnp.asarray(taps[i], jnp.complex64)
            out = out + tap * jnp.roll(field, off, axis=axis)
        return out

    pert = scale * (conv(e_hr, taps_h_rise, 0) + conv(e_hf, taps_h_fall, 0)
                    + conv(e_vr, taps_v_rise, 1) + conv(e_vf, taps_v_fall, 1))
    return g.astype(jnp.complex64) + pert


def _fit_imager(config: OpticsConfig, solver: str, chunk: int,
                stacked: bool, target_shape: tuple):
    """Shared imaging core of the M3D calibration fits: effective mask ->
    jointly max-normalized aerial image(s). ``stacked`` selects the
    through-focus path — aberrations (F, A), output (F, n, n) — and the
    target shape is validated against it up front (a mismatched pair
    otherwise broadcasts silently into a meaningless loss)."""
    from ..models.pupil import pupil_function
    from .abbe import abbe_image_points
    from .focus import through_focus_images
    from .fraunhofer import mask_spectrum

    if stacked != (len(target_shape) == 3):
        raise ValueError(
            f"aberrations {'stack' if stacked else 'vector'} needs a "
            f"{'(F, n, n)' if stacked else '(n, n)'} target, got shape "
            f"{target_shape}")

    def imaged(eff, aberrations, shifts, weights):
        spectrum = mask_spectrum(eff, config, solver=solver)
        if stacked:
            image = through_focus_images(spectrum, aberrations, shifts,
                                         weights, config, solver=solver,
                                         chunk=chunk, normalize=True)
        else:
            pupil = pupil_function(aberrations, config)
            image = abbe_image_points(spectrum, pupil, shifts, weights,
                                      config, solver=solver, chunk=chunk,
                                      normalize=True)
        return image / jnp.maximum(jnp.max(image), 1e-30)

    return imaged


def fit_edge_kernel(
    target_image: jnp.ndarray,
    geometry,
    shifts,
    weights,
    config: OpticsConfig,
    *,
    k: int = 1,
    width_nm: float = 8.0,
    solver: str = "gau23",
    chunk: int = 8,
    steps: int = 200,
    learning_rate: float = 0.02,
    aberrations=None,
) -> tuple[EdgeKernelM3D, list[float]]:
    """Calibrate an :class:`EdgeKernelM3D` (4·(2k+1) complex taps) against
    a reference aerial image — the multi-tap analog of
    :func:`fit_boundary_layer`, same Adam-through-the-imaging-stack loop.
    Edge orientations absent from the calibration pattern simply receive
    zero gradient and keep zero taps.

    A 2-D ``aberrations`` stack (F, A) with a matching (F, n, n) target
    fits THROUGH FOCUS (see :func:`fit_boundary_layer`)."""
    import optax

    from .fraunhofer import mask_spectrum

    if aberrations is None:
        aberrations = jnp.zeros((1,), jnp.float32)
    aberrations = jnp.asarray(aberrations, jnp.float32)
    geometry = jnp.asarray(geometry)
    target = jnp.asarray(target_image, jnp.float32)
    target = target / jnp.maximum(jnp.max(target), 1e-30)
    imaged = _fit_imager(config, solver, chunk, aberrations.ndim == 2,
                         target.shape)
    n_taps = 2 * int(k) + 1

    optimizer = optax.adam(learning_rate)

    @jax.jit
    def step(params, opt_state, geometry, target, aberrations, shifts, weights):
        def loss_fn(p):
            taps = jax.lax.complex(p[..., 0], p[..., 1])  # (4, n_taps)
            eff = apply_edge_kernel(
                geometry, config, width_nm=width_nm,
                taps_h_rise=taps[0], taps_h_fall=taps[1],
                taps_v_rise=taps[2], taps_v_fall=taps[3])
            image = imaged(eff, aberrations, shifts, weights)
            return jnp.mean((image - target) ** 2)

        value, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, value

    params = jnp.zeros((4, n_taps, 2), jnp.float32)
    opt_state = optimizer.init(params)
    history: list[float] = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, geometry, target,
                                       aberrations, jnp.asarray(shifts),
                                       jnp.asarray(weights))
        history.append(float(loss))
    # read the float params back FIRST: eager complex math on device
    # arrays dies on the TPU tunnel
    host = np.asarray(params)
    taps = host[..., 0] + 1j * host[..., 1]
    fitted = EdgeKernelM3D(
        width_nm=width_nm,
        taps_h_rise=tuple(complex(c) for c in taps[0]),
        taps_h_fall=tuple(complex(c) for c in taps[1]),
        taps_v_rise=tuple(complex(c) for c in taps[2]),
        taps_v_fall=tuple(complex(c) for c in taps[3]),
    )
    return fitted, history


def fit_boundary_layer(
    target_image: jnp.ndarray,
    geometry,
    shifts,
    weights,
    config: OpticsConfig,
    *,
    width_nm: float = 8.0,
    solver: str = "gau23",
    chunk: int = 8,
    steps: int = 200,
    learning_rate: float = 0.02,
    aberrations=None,
    fit_asym: bool = False,
) -> tuple[BoundaryLayer, list[float]]:
    """Calibrate (beta_h, beta_v) against a reference aerial image.
    ``fit_asym=True`` additionally fits the rising/falling edge asymmetry
    (beta_h_asym, beta_v_asym) — needed when the reference image carries an
    oblique-incidence pattern shift (EUV chief-ray shadowing).

    The reference image typically comes from a rigorous EMF solver or
    measurement; this fits the 4 real BL degrees of freedom by Adam on the
    normalized-image MSE, through the full differentiable imaging stack.
    Strip width is held fixed (width and |beta| are nearly degenerate to
    first order — fit beta at a plausible width instead of both).

    THROUGH-FOCUS fits: pass ``aberrations`` as an (F, A) stack (e.g. from
    :func:`..ops.focus.focus_stack_aberrations`) and ``target_image`` as the
    matching (F, n, n) focal stack, jointly normalized. An in-focus image
    constrains Im β only at second order (its sign — the direction of the
    thick-mask best-focus shift — is nearly flat in the loss); the ±defocus
    planes' asymmetry pins it at first order. Both stacks share ONE
    normalization (their joint max), so through-focus contrast loss stays
    in the signal.

    Returns the fitted :class:`BoundaryLayer` and the loss history.
    """
    import optax

    if aberrations is None:
        aberrations = jnp.zeros((1,), jnp.float32)
    aberrations = jnp.asarray(aberrations, jnp.float32)
    geometry = jnp.asarray(geometry)
    target = jnp.asarray(target_image, jnp.float32)
    target = target / jnp.maximum(jnp.max(target), 1e-30)
    imaged = _fit_imager(config, solver, chunk, aberrations.ndim == 2,
                         target.shape)

    optimizer = optax.adam(learning_rate)

    @jax.jit
    def step(params, opt_state, geometry, target, aberrations, shifts, weights):
        def loss_fn(p):
            beta_h = jax.lax.complex(p["bh_re"], p["bh_im"])
            beta_v = jax.lax.complex(p["bv_re"], p["bv_im"])
            asym = ({"beta_h_asym": jax.lax.complex(p["ah_re"], p["ah_im"]),
                     "beta_v_asym": jax.lax.complex(p["av_re"], p["av_im"])}
                    if "ah_re" in p else {})
            eff = apply_boundary_layers(geometry, config, width_nm=width_nm,
                                        beta_h=beta_h, beta_v=beta_v, **asym)
            image = imaged(eff, aberrations, shifts, weights)
            return jnp.mean((image - target) ** 2)

        value, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, value

    keys = ["bh_re", "bh_im", "bv_re", "bv_im"]
    if fit_asym:
        keys += ["ah_re", "ah_im", "av_re", "av_im"]
    params = {k: jnp.float32(0.0) for k in keys}
    opt_state = optimizer.init(params)
    history: list[float] = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, geometry, target,
                                       aberrations, jnp.asarray(shifts),
                                       jnp.asarray(weights))
        history.append(float(loss))
    fitted = BoundaryLayer(
        width_nm=width_nm,
        beta_h=complex(float(params["bh_re"]), float(params["bh_im"])),
        beta_v=complex(float(params["bv_re"]), float(params["bv_im"])),
        beta_h_asym=(complex(float(params["ah_re"]), float(params["ah_im"]))
                     if fit_asym else 0.0),
        beta_v_asym=(complex(float(params["av_re"]), float(params["av_im"]))
                     if fit_asym else 0.0),
    )
    return fitted, history


def grating_geometry(config: OpticsConfig, *, pitch_px: int, duty: float,
                     transmission: complex = 0.0, axis: int = 1):
    """Drawn thin-mask line/space layout matching the centering convention of
    :func:`..rcwa.rcwa_effective_mask`: absorber of complex ``transmission``
    covering ``duty`` of each period, centered on x = 0 (periodic wrap).
    ``duty * pitch_px`` should be an ODD pixel count for an exact raster: an
    odd run of pixels centers on x = 0 exactly (pixel i spans i ± 1/2, so a
    width-(2m+1) rect covers pixel centers −m..m with no partial pixels); an
    even count cannot center on a pixel and rasterizes one pixel narrow."""
    import numpy as np

    n = int(config.pixel_number)
    if pitch_px <= 0 or n % int(pitch_px):
        raise ValueError(f"pitch_px={pitch_px} must divide pixel_number={n}")
    x = np.arange(n)
    half = 0.5 * duty * pitch_px
    dist = np.minimum(x % pitch_px, pitch_px - (x % pitch_px))
    row = np.where(dist < half, complex(transmission), 1.0 + 0.0j)
    geom = np.broadcast_to(row[None, :], (n, n))
    if axis == 0:
        geom = geom.T
    if complex(transmission) == 0.0:
        # binary masks stay real float32 (the common fast path)
        return jnp.asarray(np.ascontiguousarray(geom.real), jnp.float32)
    # complex (PSM) layouts upload as re/im planes: complex host->device
    # transfers fail on the TPU tunnel (see .xfer)
    from ..xfer import to_device_complex

    return to_device_complex(np.ascontiguousarray(geom)).astype(jnp.complex64)


def boundary_layer_from_rcwa(
    config: OpticsConfig,
    *,
    stack="binary_cr",
    pitch_px: int = 16,
    duty: float = 7.0 / 16.0,
    illumination_pol: str = "unpolarized",
    width_nm: float = 8.0,
    magnification: float = 4.0,
    n_harmonics: int = 31,
    sigma_out: float = 0.5,
    solver: str = "gau23",
    chunk: int = 8,
    steps: int = 150,
    learning_rate: float = 0.05,
    incidence_deg: float = 0.0,
    azimuth_deg: float = 0.0,
    taps: int = 0,
    defocus_nm=(),
) -> tuple[BoundaryLayer, dict]:
    """Calibrate the BL model from first principles — no external EMF tool.

    Runs the in-repo rigorous RCWA oracle (:mod:`.rcwa`) on a line/space
    topography of the named absorber ``stack``, images the rigorous near
    field through the standard Abbe stack, and fits β by gradient descent
    against that image (one fit per polarization). Polarization mapping for
    lines along y (a VERTICAL edge): E ∥ lines is TE, E ⊥ lines is TM, so

    - ``illumination_pol='x'``: β_v = β_TM, β_h = β_TE;
    - ``illumination_pol='y'``: β_v = β_TE, β_h = β_TM;
    - ``'unpolarized'``: both β fit against the TE/TM-averaged (incoherent)
      image — by rotational symmetry β_h = β_v, and H–V bias vanishes, as
      it physically must for unpolarized illumination at normal incidence.

    Returns the calibrated :class:`BoundaryLayer` and a report dict with the
    per-polarization fits, loss histories, and the rigorous/thin/corrected
    image residuals (nRMS) that certify the fit.

    The default ``duty`` keeps ``duty * pitch_px`` odd so the drawn layout
    rasterizes exactly (see :func:`grating_geometry`) — otherwise a 1-px CD
    mismatch between the thin layout and the RCWA topography leaks into β.

    An in-focus target determines Re β (the CD bias) strongly but
    constrains Im β only at second order — its *sign* (the direction of the
    thick-mask best-focus shift) can land either way between runs/backends.
    ``defocus_nm`` (e.g. ``(-80, 0, 80)``) extends the calibration target
    to a THROUGH-FOCUS stack — the rigorous near field imaged at every
    plane, jointly normalized — which pins Im β (and the best-focus-shift
    direction) at first order via the ±defocus asymmetry. Empty (default):
    the in-focus-only fit. CLI: ``m3dcal --defocus -80 0 80``.

    ``incidence_deg`` tilts the illumination — the EUV chief-ray geometry
    when used with the reflective ``euv_ta`` stack. ``azimuth_deg`` points
    the tilt within the layout plane (degrees from +x; 0, the default,
    tilts across the vertical lines — the across-slit chief-ray rotation
    is calibrated by sweeping this). A non-zero tilt turns on the
    asymmetric fit: the returned model carries ``beta_v_asym``
    (rising/falling vertical-edge split), which reproduces the shadowing
    pattern shift. In the 1-px BoundaryLayer model ``beta_h_asym`` stays 0
    (a tilt along x shadows horizontal edges symmetrically).

    ``taps > 0`` fits the multi-tap :class:`EdgeKernelM3D` instead (offsets
    −taps..+taps per edge side) and returns it — required at EUV, where the
    near-field perturbation spans several pixels and the 1-px strip model
    floors an order of magnitude above the kernel model (see
    :class:`EdgeKernelM3D`). Horizontal-edge taps: at normal incidence
    they are the mirror-symmetrized vertical fit (exact by rotational
    symmetry); at oblique incidence they are calibrated DIRECTLY against
    the conical-mount rigorous near field of a horizontal grating
    (:func:`..rcwa.rcwa_orders_conical` at azimuth ``90 − azimuth_deg``
    from the horizontal grating vector) — the chief ray traverses the
    absorber obliquely ALONG those lines, which changes the near field by
    several percent even though it shadows nothing across them (the
    mirror-symmetrized approximation missed exactly this).
    """
    import numpy as np

    from ..models.mask import Mask, from_array
    from ..models.source import LightSource
    from ..parallel import padded_source_arrays
    from ..simulate import simulate
    from .focus import focus_stack_aberrations
    from .rcwa import rcwa_effective_mask, thin_mask_transmission

    if illumination_pol not in ("x", "y", "unpolarized"):
        raise ValueError(f"unknown illumination_pol {illumination_pol!r}")

    src = np.asarray(LightSource(config, sigma_out=sigma_out).classical())
    shifts, weights, _ = padded_source_arrays(src, chunk)
    defocus_nm = (tuple(float(d) for d in
                        np.atleast_1d(np.asarray(defocus_nm, np.float64)))
                  if np.size(defocus_nm) else ())
    stack_ab = (np.asarray(focus_stack_aberrations(
        np.zeros(5, np.float32), np.asarray(defocus_nm, np.float32)))
        if defocus_nm else None)

    t_thin = thin_mask_transmission(stack, config.wavelength,
                                    incidence_deg=incidence_deg)
    if abs(t_thin) < 0.02:
        t_thin = 0.0  # binary: draw the standard opaque layout
    fit_asym = incidence_deg != 0.0
    # Oblique + multi-tap: calibrate horizontal edges DIRECTLY against the
    # conical-mount near field (see the docstring) instead of symmetrizing.
    direct_h = taps > 0 and fit_asym

    def imaged(geometry) -> np.ndarray:
        # host arrays go through from_array (complex uploads as re/im
        # planes — required on the TPU tunnel); device arrays wrap directly
        # (a host round-trip would be a complex readback, which also fails)
        if isinstance(geometry, jax.Array):
            mask = Mask(geometry=geometry, config=config)
        else:
            mask = from_array(geometry, config)
        if stack_ab is None:
            img = np.asarray(
                simulate(mask, src, solver=solver, normalize=True).image)
        else:
            # through-focus target: one plane per defocus, ONE joint
            # normalization (the through-focus contrast loss is signal)
            img = np.stack([
                np.asarray(simulate(mask, src, ab, solver=solver,
                                    normalize=True).image)
                for ab in stack_ab])
        return img / max(float(img.max()), 1e-30)

    def nrms(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)))

    report = {"pitch_px": pitch_px, "duty": duty,
              "defocus_nm": list(defocus_nm), "azimuth_deg": azimuth_deg,
              "thin_nrms": {}, "fit_nrms": {}, "history": {}}

    def calibration_pass(axis: int, azim: float, tag: str) -> dict:
        """Fit one grating orientation against its rigorous near field:
        axis=1 (vertical lines, grating vector x) at conical azimuth
        ``azim`` = the tilt direction itself; axis=0 (horizontal lines,
        grating vector y) at ``90 − azimuth_deg``. Report keys for the
        horizontal pass carry an ``h_`` prefix. A pass at exactly 90°
        (tilt purely ALONG the lines) has a mirror-symmetric near field,
        so its edge-kernel taps are symmetrized before certification —
        the fit's rise/fall split is an image-null degeneracy on the
        calibration grating there, not physics, and shipping it would
        shift patterns the rigorous field does not shift."""
        sym_taps = taps > 0 and float(azim) == 90.0
        geom = grating_geometry(config, pitch_px=pitch_px, duty=duty,
                                transmission=t_thin, axis=axis)
        thin_img = imaged(geom)
        targets = {}
        for pol in ("te", "tm"):
            rig = rcwa_effective_mask(
                config, pitch_px=pitch_px, duty=duty, stack=stack, pol=pol,
                axis=axis, magnification=magnification,
                n_harmonics=n_harmonics, incidence_deg=incidence_deg,
                azimuth_deg=azim)
            targets[pol] = imaged(rig)
        fit_targets = ({"avg": 0.5 * (targets["te"] + targets["tm"])}
                       if illumination_pol == "unpolarized" else targets)
        axis_fits = {}
        for key, target in fit_targets.items():
            if taps > 0:
                bl, hist = fit_edge_kernel(
                    target, geom, shifts, weights, config, k=taps,
                    width_nm=width_nm, solver=solver, chunk=chunk,
                    steps=steps, learning_rate=learning_rate,
                    aberrations=stack_ab)
            else:
                bl, hist = fit_boundary_layer(
                    target, geom, shifts, weights, config,
                    width_nm=width_nm, solver=solver, chunk=chunk,
                    steps=steps, learning_rate=learning_rate,
                    fit_asym=fit_asym, aberrations=stack_ab)
            if sym_taps:
                # symmetrize the taps of this pass's own edge orientation
                names = (("taps_h_rise", "taps_h_fall") if axis == 0
                         else ("taps_v_rise", "taps_v_fall"))
                tr, tf = getattr(bl, names[0]), getattr(bl, names[1])
                kk = len(tr)
                sym = tuple(0.5 * (tr[i] + tf[kk - 1 - i])
                            for i in range(kk))
                bl = dataclasses.replace(
                    bl, **{names[0]: sym, names[1]: sym[::-1]})
            axis_fits[key] = bl
            # apply under jit: eager complex arithmetic dies on the tunnel
            corrected = imaged(
                jax.jit(bl.apply, static_argnums=1)(geom, config))
            report["thin_nrms"][tag + key] = nrms(thin_img, target)
            report["fit_nrms"][tag + key] = nrms(corrected, target)
            report["history"][tag + key] = hist
        return axis_fits

    fits = calibration_pass(1, azimuth_deg, "")
    fits_h = (calibration_pass(0, 90.0 - azimuth_deg, "h_")
              if direct_h else None)

    if taps > 0:
        result = _edge_kernel_from_fits(fits, illumination_pol, width_nm,
                                        fits_h=fits_h)
    # the fitted asymmetry lives on the calibration grating's vertical
    # edges only (the tilt is across them; see the docstring)
    elif illumination_pol == "unpolarized":
        beta = fits["avg"].beta_v
        result = BoundaryLayer(width_nm=width_nm, beta_h=beta, beta_v=beta,
                               beta_v_asym=fits["avg"].beta_v_asym)
    elif illumination_pol == "x":
        result = BoundaryLayer(width_nm=width_nm,
                               beta_h=fits["te"].beta_v,
                               beta_v=fits["tm"].beta_v,
                               beta_v_asym=fits["tm"].beta_v_asym)
    else:
        result = BoundaryLayer(width_nm=width_nm,
                               beta_h=fits["tm"].beta_v,
                               beta_v=fits["te"].beta_v,
                               beta_v_asym=fits["te"].beta_v_asym)
    report["fits"] = fits
    if fits_h is not None:
        report["fits_h"] = fits_h
    return result, report


def _symmetrized_taps(fit: EdgeKernelM3D) -> tuple[tuple, tuple]:
    """(rise, fall) horizontal-edge tap vectors from a vertical-edge fit:
    the mirror x → −x maps a rising edge at offset o to a falling edge at
    −o, so the incidence-symmetric part is the average of the two — what a
    horizontal edge (unshadowed by an x-tilt) should carry. At normal
    incidence this is exact (the fit already satisfies rise[o] == fall[−o]
    up to optimizer noise); at oblique incidence it strips the shadowing
    asymmetry, which belongs to the tilt axis only."""
    vr, vf = fit.taps_v_rise, fit.taps_v_fall
    sym = tuple(0.5 * (vr[i] + vf[len(vf) - 1 - i]) for i in range(len(vr)))
    return sym, sym[::-1]


def _edge_kernel_from_fits(fits: dict, illumination_pol: str,
                           width_nm: float,
                           fits_h: dict | None = None) -> EdgeKernelM3D:
    """Assemble the full (h, v) edge kernel from per-orientation fits, with
    the same TE/TM-to-orientation mapping as the BoundaryLayer path. The
    TE/TM keys are relative to each grating's own lines, so the SAME key
    selects the matching physical polarization in both passes (e.g.
    x-polarized light is TM across vertical lines and TE along horizontal
    ones). Without a horizontal pass (``fits_h`` None — normal incidence),
    horizontal taps are the mirror-symmetrized vertical fit."""
    if illumination_pol == "unpolarized":
        v_fit = h_fit = fits["avg"]
        h_key = "avg"
    elif illumination_pol == "x":
        v_fit, h_fit = fits["tm"], fits["te"]
        h_key = "te"
    else:
        v_fit, h_fit = fits["te"], fits["tm"]
        h_key = "tm"
    if fits_h is not None:
        h = fits_h[h_key]
        h_rise, h_fall = h.taps_h_rise, h.taps_h_fall
    else:
        h_rise, h_fall = _symmetrized_taps(h_fit)
    return EdgeKernelM3D(
        width_nm=width_nm,
        taps_h_rise=h_rise, taps_h_fall=h_fall,
        taps_v_rise=v_fit.taps_v_rise, taps_v_fall=v_fit.taps_v_fall)


# ---------------------------------------------------------------------------
# JSON round trip: m3dcal writes, imaging commands read
# ---------------------------------------------------------------------------


def _c_pair(z) -> list:
    return [float(complex(z).real), float(complex(z).imag)]


def model_to_json(model) -> dict:
    """Serializable dict for a calibrated M3D model — the contract between
    ``m3dcal --out`` and the imaging commands' ``--m3d`` flag. Complex
    numbers become [re, im] pairs (JSON has no complex type)."""
    if isinstance(model, EdgeKernelM3D):
        return {
            "model": f"edge_kernel_k{model.k}",
            "width_nm": float(model.width_nm),
            "taps_v_rise": [_c_pair(c) for c in model.taps_v_rise],
            "taps_v_fall": [_c_pair(c) for c in model.taps_v_fall],
            "taps_h_rise": [_c_pair(c) for c in model.taps_h_rise],
            "taps_h_fall": [_c_pair(c) for c in model.taps_h_fall],
        }
    if isinstance(model, BoundaryLayer):
        out = {
            "model": "boundary_layer",
            "width_nm": float(model.width_nm),
            "beta_h": _c_pair(model.beta_h),
            "beta_v": _c_pair(model.beta_v),
        }
        if model.beta_h_asym or model.beta_v_asym:
            out["beta_h_asym"] = _c_pair(model.beta_h_asym)
            out["beta_v_asym"] = _c_pair(model.beta_v_asym)
        return out
    raise TypeError(f"not an M3D model: {type(model).__name__}")


def model_from_json(obj) -> "BoundaryLayer | EdgeKernelM3D":
    """Rebuild a :class:`BoundaryLayer` / :class:`EdgeKernelM3D` from the
    ``m3dcal`` output JSON (a dict, a JSON string, or a file path). Extra
    keys (the calibration report: NRMS tables, stack name, timings) are
    ignored, so the whole m3dcal stdout line round-trips."""
    import json as _json
    import os as _os

    if isinstance(obj, (str, _os.PathLike)):
        s = _os.fspath(obj)
        if _os.path.exists(s):
            with open(s) as fh:
                obj = _json.load(fh)
        else:
            obj = _json.loads(s)
    if not isinstance(obj, dict) or "model" not in obj:
        raise ValueError("expected an m3dcal JSON object with a 'model' key")

    def _z(pair) -> complex:
        return complex(float(pair[0]), float(pair[1]))

    kind = str(obj["model"])
    width = float(obj.get("width_nm", 8.0))
    if kind.startswith("edge_kernel"):
        return EdgeKernelM3D(
            width_nm=width,
            taps_v_rise=tuple(_z(p) for p in obj["taps_v_rise"]),
            taps_v_fall=tuple(_z(p) for p in obj["taps_v_fall"]),
            taps_h_rise=tuple(_z(p) for p in obj["taps_h_rise"]),
            taps_h_fall=tuple(_z(p) for p in obj["taps_h_fall"]),
        )
    if kind == "boundary_layer":
        return BoundaryLayer(
            width_nm=width,
            beta_h=_z(obj.get("beta_h", (0.0, 0.0))),
            beta_v=_z(obj.get("beta_v", (0.0, 0.0))),
            beta_h_asym=_z(obj.get("beta_h_asym", (0.0, 0.0))),
            beta_v_asym=_z(obj.get("beta_v_asym", (0.0, 0.0))),
        )
    raise ValueError(f"unknown M3D model kind {kind!r}")
