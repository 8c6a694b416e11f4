"""NL-means denoise as a Pallas TPU kernel.

The XLA formulation of NL-means (441 shifted-difference + box-filter chains)
is HBM-bound: every search offset round-trips several (H, W) float32
intermediates through HBM because the cumsum-based box filters break fusion.
This kernel keeps the shifted frames, accumulators and every intermediate in
VMEM: HBM traffic is one read of the 21 row-shifted copies and one write of
the result per frame.

Structure: the 21 vertical (dy) shifts are pre-stacked outside the kernel
(Mosaic only allows dynamic indexing on the leading dimension), the kernel
runs a fori_loop over dy (3 rows per iteration) with the 21 horizontal (dx)
shifts unrolled as static lane slices, the 7x7 patch box-sum is a
shift-doubling tree (8 shifted adds), and num/den accumulate into 8
round-robin partials to break the 441-long serial add chain — all VPU work
on VMEM-resident data.

Numerics are BIT-EXACT with cv2.fastNlMeansDenoising (and so with
ops.nl_means_denoise_u8 and the native C kernel): the weight is cv2's
fixed-point law (boxsum>>6 LUT quantization, 19096 fixed-point mult, 0.001
cutoff — see imageops.nlm_weight_lut), computed in-kernel as
round(fpm*exp(-idx*c)) with the boundary-risky indices pinned by static
selects (exact under any <=16-ulp exp), and num/den accumulate in int32 —
order-independent, so every kernel variant produces identical bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H_PARAM = 3.0
TEMPLATE = 7
SEARCH = 21
_N_PARTIAL = 8  # round-robin accumulators: break the 441-long serial chain
_DY_UNROLL = 3  # dy rows per fori iteration (Mosaic pipelines across rows)
_V_UNROLL = 2   # v-rows per fori iteration in the symmetric kernel


@functools.lru_cache(maxsize=None)
def _lut_meta(h=H_PARAM, template=TEMPLATE, search=SEARCH):
    """cv2 fixed-point weight-law constants for the in-kernel computation.

    Returns (lut, fpm, bin_shift, c, risky): the exact int LUT (see
    imageops.nlm_weight_lut), the fixed-point multiplier, the boxsum
    quantization shift, the exp argument scale per LUT index, and the LUT
    indices whose round(fpm*exp(-idx*c)) sits so close to a .5 boundary
    that a <=16-ulp f32 exp could round the other way — the kernels patch
    those few indices with static selects, making the weights exact under
    ANY exp implementation within that error bound."""
    from classifier_pipeline_tpu.ops.imageops import nlm_weight_lut

    lut = nlm_weight_lut(h, template, search)
    fpm = (2**31 - 1) // (search * search * 255)
    tpl_sq = template * template
    bin_shift = 0
    while (1 << bin_shift) < tpl_sq:
        bin_shift += 1
    c = (float(1 << bin_shift) / tpl_sq) / (h * h)
    idx = np.arange(len(lut), dtype=np.float64)
    prod = fpm * np.exp(-idx * c)
    margin = np.abs(prod - np.floor(prod) - 0.5)
    tol = prod * (16 * 2.0**-24) + 2.0**-10
    risky = tuple(int(k) for k in np.nonzero(margin < tol)[0])
    return lut, fpm, bin_shift, c, risky


def _w_exact(cb, h=H_PARAM, template=TEMPLATE, search=SEARCH):
    """Exact cv2 fixed-point weight plane from an f32 boxsum plane.

    cb holds exact integers (squared u8 diffs box-summed: <= 49*255^2 <
    2^24, exact in f32 regardless of summation order). idx = floor(cb /
    2^bin_shift) is exact; the weight is round(fpm * exp(-idx*c)) with the
    boundary-risky indices pinned by static selects and the 0.001*fpm
    cutoff applied as idx >= len(lut) (the LUT construction ends exactly
    where the cutoff zeroes). Returns integer-valued f32 (w <= fpm < 2^15,
    exactly representable)."""
    lut, fpm, bin_shift, c, risky = _lut_meta(h, template, search)
    t = jnp.floor(cb * (1.0 / (1 << bin_shift)))
    w = jnp.round(fpm * jnp.exp(t * (-c)))
    for k in risky:
        w = jnp.where(t == float(k), float(int(lut[k])), w)
    return jnp.where(t < float(len(lut)), w, 0.0)


def _div_round_i32(num, den):
    """Exact (num + den//2) // den on int32, den > 0.

    cv2 computes this in unsigned arithmetic because num + den//2 can
    exceed INT32_MAX; here the identity (num + den//2)//den ==
    (num + den//2 - den)//den + 1 keeps everything in i32 range, the
    quotient is seeded by an f32 division (|error| < 1 because the true
    quotient is <= 255) and corrected exactly with integer remainders."""
    m = num + jax.lax.shift_right_logical(den, 1) - den
    q = jnp.floor(m.astype(jnp.float32) / den.astype(jnp.float32)).astype(
        jnp.int32
    )
    r = m - q * den
    q = q + (r >= den).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return q + 1


def _dy_unroll(search):
    return _DY_UNROLL if search % _DY_UNROLL == 0 else 1


def _box7_rows_tree(d2, H, Wk):
    """Row box-sum of 7 via shift-doubling (win 7 = 4 + 2 + 1): 4 adds and
    4 sublane shifts instead of 6 each, and a log-depth dependency chain.
    Float reassociation vs the sequential version is parity-safe (verified
    by an accumulation-order probe against the golden tracking output)."""
    a = jax.lax.slice(d2, (0, 0), (H + 5, Wk)) + jax.lax.slice(
        d2, (1, 0), (H + 6, Wk))
    b = jax.lax.slice(a, (0, 0), (H + 3, Wk)) + jax.lax.slice(
        a, (2, 0), (H + 5, Wk))
    return (jax.lax.slice(b, (0, 0), (H, Wk))
            + jax.lax.slice(a, (4, 0), (H + 4, Wk))[:H]
            + jax.lax.slice(d2, (6, 0), (H + 6, Wk))[:H])


def _box7_cols_tree(rb, H, Wc):
    a = jax.lax.slice(rb, (0, 0), (H, Wc + 5)) + jax.lax.slice(
        rb, (0, 1), (H, Wc + 6))
    b = jax.lax.slice(a, (0, 0), (H, Wc + 3)) + jax.lax.slice(
        a, (0, 2), (H, Wc + 5))
    return (jax.lax.slice(b, (0, 0), (H, Wc))
            + jax.lax.slice(a, (0, 4), (H, Wc + 4))[:, :Wc]
            + jax.lax.slice(rb, (0, 6), (H, Wc + 6))[:, :Wc])


def _box_cb(d2, HO, WO, TEMPLATE):
    """Box-sum of TEMPLATE x TEMPLATE over d2 -> (HO, WO). Tree for the
    production TEMPLATE=7 (log-depth), sequential otherwise."""
    Wd = d2.shape[1]
    if TEMPLATE == 7:
        rb = _box7_rows_tree(d2, HO, Wd)
        return _box7_cols_tree(rb, HO, WO)
    rb = jax.lax.slice(d2, (0, 0), (HO, Wd))
    for r in range(1, TEMPLATE):
        rb = rb + jax.lax.slice(d2, (r, 0), (r + HO, Wd))
    cb = jax.lax.slice(rb, (0, 0), (HO, WO))
    for c in range(1, TEMPLATE):
        cb = cb + jax.lax.slice(rb, (0, c), (HO, c + WO))
    return cb


class _SymGrid:
    """Shared geometry + math of the two symmetric-weights kernels.

    Both kernels MUST produce bit-identical weight planes — the exact-parity
    tests rely on it — so the weight computation, the v=0 horizontal tail,
    and the finalize step live here in exactly one copy. The kernels differ
    only in how they realize the v-dependent row shift of the -o reuse tap.
    """

    def __init__(self, shifts_ref, H, W, nimg, TEMPLATE, SEARCH):
        self.H, self.W, self.nimg = H, W, nimg
        self.TEMPLATE = TEMPLATE
        self.SEARCH = SEARCH
        self.ts = ts = TEMPLATE // 2
        self.hs = hs = SEARCH // 2
        self.p = p = hs + ts
        self.fpm = _lut_meta(H_PARAM, TEMPLATE, SEARCH)[1]
        self.HG = HG = H + 2 * ts + hs   # uniform extended row grid
        WG = W + 2 * ts + hs             # per-image work width
        self.Wpad = Wpad = W + 2 * p     # per-image strip width
        self.WGp = WGp = (nimg - 1) * Wpad + WG   # packed work width
        self.WA = (nimg - 1) * Wpad + W  # packed accumulator width
        self.B = B = shifts_ref[0, 0]    # (HG, nimg*Wpad) unshifted frame
        # loop-invariant base slices for the two column origins
        self.B0 = jax.lax.slice(B, (0, 0), (HG, WGp))
        self.Bh = jax.lax.slice(B, (0, hs), (HG, hs + WGp))
        # integer copy of the frame for the exact i32 accumulation
        self.Bi = B.astype(jnp.int32)

    def weights(self, A, u):
        """Weight plane + plus-tap slices for offset pair o = (v, u).
        Weight values are the exact cv2 fixed-point integers (f32-held);
        w_i32 is the integer copy the accumulators consume."""
        H, hs, p = self.H, self.hs, self.p
        c0 = 0 if u >= 0 else hs
        bsl = self.B0 if u >= 0 else self.Bh
        asl = jax.lax.slice(A, (0, c0 + u), (self.HG, c0 + u + self.WGp))
        d2 = (asl - bsl) ** 2
        cb = _box_cb(d2, H + hs, self.WA + hs, self.TEMPLATE)
        w = _w_exact(cb, H_PARAM, self.TEMPLATE, self.SEARCH)
        wi = w.astype(jnp.int32)
        wc = hs if u >= 0 else 0
        wp = jax.lax.slice(wi, (hs, wc), (hs + H, wc + self.WA))
        cp = jax.lax.slice(A, (p, p + u), (p + H, p + u + self.WA)).astype(
            jnp.int32
        )
        return w, wi, wp, cp, wc

    def v0_tail(self, nums, dens, k):
        """v=0 row: horizontal-only pairs, both taps at static offsets."""
        H, hs, p, WA = self.H, self.hs, self.p, self.WA
        for u in range(1, hs + 1):
            w, wi, wp, cp, wc = self.weights(self.B, u)
            wm = jax.lax.slice(wi, (hs, wc - u), (hs + H, wc - u + WA))
            cm = jax.lax.slice(self.Bi, (p, p - u), (p + H, p - u + WA))
            i, j = k % _N_PARTIAL, (k + 1) % _N_PARTIAL
            nums[i] = nums[i] + wp * cp
            dens[i] = dens[i] + wp
            nums[j] = nums[j] + wm * cm
            dens[j] = dens[j] + wm
            k += 2
        return k

    def finalize(self, nums, dens, out_ref):
        """Reduce the round-robin partials, add the centre tap (dist 0 =>
        w == fpm exactly, no exp needed), exact rounding division, emit
        strips. Integer accumulation makes the result independent of
        accumulation order — all kernel variants are bit-identical."""
        H, p, WA, Wpad = self.H, self.p, self.WA, self.Wpad
        num = nums[0]
        for t in nums[1:]:
            num = num + t
        den = dens[0]
        for t in dens[1:]:
            den = den + t
        centre = jax.lax.slice(self.Bi, (p, p), (p + H, p + WA))
        num = num + self.fpm * centre
        den = den + self.fpm
        out = jnp.clip(_div_round_i32(num, den), 0, 255)
        for i in range(self.nimg):
            out_ref[0, i] = jax.lax.slice(
                out, (0, i * Wpad), (H, i * Wpad + self.W))


def _kernel_sym(shifts_ref, out_ref, *, H, W, nimg, TEMPLATE=TEMPLATE,
                SEARCH=SEARCH):
    """Symmetric-weights NL-means: half the search offsets.

    For a search offset o, the patch distance is symmetric:
    cb_o(x) = sum_t (I(x+o+t) - I(x+t))^2 = cb_{-o}(x+o) — the squared
    differences are sign-symmetric and the box-sum tree order is fixed, so
    the weight planes w_o and w_{-o} are the SAME array read at shifted
    positions, bit-exactly. The kernel therefore computes d2/box/exp for
    only 221 of the 441 offsets (v in 0..hs) and accumulates each weight
    plane twice: at x for +o and at x-o for -o, with v a fori_loop index so
    program size stays small.

    Work arrays live on an extended grid (HG = H+2ts+hs rows; per-u column
    origin 0 for u>=0, hs for u<0) so every per-pair slice offset is
    static. The -o taps of a v-iteration accumulate into a local buffer M
    indexed by y = x - v (static offsets); ONE one-hot permutation matmul
    per v-iteration shifts M into output coordinates (Mosaic rejects
    unaligned dynamic sublane rotates). `nimg` images are packed
    side-by-side along lanes (each a Wpad-wide strip).

    Output matches _kernel up to float num/den summation order (the weight
    values themselves are bit-identical; verified parity-safe for the
    golden tracking output).
    """
    g = _SymGrid(shifts_ref, H, W, nimg, TEMPLATE, SEARCH)
    hs, ts, p, WA = g.hs, g.ts, g.p, g.WA

    # v-rows per fori iteration: a larger loop body gives Mosaic more
    # independent work to pipeline (same reason the non-symmetric kernel
    # used _DY_UNROLL=3); hs=10 splits evenly into 5 iterations of 2
    VU = _V_UNROLL if hs % _V_UNROLL == 0 else 1

    def vrow(v, nums, dens):
        A = shifts_ref[0, v]
        # minus-tap accumulators over y = x - v (rows y in [-hs, H)) — kept
        # in f32 SPLIT by weight byte so every staged value stays < 2^24
        # (exact in f32, so the permutation matmul below is exact): per-v
        # sums over 21 pairs bound hi = w>>8 (<75) * 255 * 21 and
        # lo = (w&255) * 255 * 21 well under 2^24.
        mz = jnp.zeros((H + hs, WA), jnp.float32)
        mhi, mlo, mde = mz, mz, mz
        k = 0
        for u in range(-hs, hs + 1):
            w, wi, wp, cp, wc = g.weights(A, u)
            i = k % _N_PARTIAL
            nums[i] = nums[i] + wp * cp
            dens[i] = dens[i] + wp
            # -o tap at static offsets in y coordinates
            wmf = jax.lax.slice(w, (0, wc - u), (H + hs, wc - u + WA))
            cmf = jax.lax.slice(g.B, (ts, p - u), (ts + H + hs, p - u + WA))
            whi = jnp.floor(wmf * (1.0 / 256.0))
            wlo = wmf - whi * 256.0
            mhi = mhi + whi * cmf
            mlo = mlo + wlo * cmf
            mde = mde + wmf
            k += 1
        # shift the minus-tap buffers into output coordinates: output row
        # x_r reads M row x_r - v + hs, i.e. rows [hs, hs+H) after shifting
        # M down by v. Mosaic's dynamic sublane rotate demands (8,128)-
        # aligned shapes, so the shift is a one-hot permutation matmul
        # instead: P[r, c] = (c == r - v), exact in f32 (each output row is
        # one 1.0*x product of a < 2^24 value), negligible MXU work at this
        # size, and ONE dynamic op per v-row instead of one per offset pair.
        n = H + hs
        ridx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        P = (cidx == ridx - v).astype(jnp.float32)

        def shift(t):
            # HIGHEST pins true-f32 contraction: the exactness argument
            # (one 1.0*x product per output row) requires the MXU not to
            # round the accumulators through bf16
            tr = jax.lax.dot(P, t, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
            return jax.lax.slice(tr, (hs, 0), (hs + H, WA))

        nums[-1] = (nums[-1]
                    + shift(mhi).astype(jnp.int32) * 256
                    + shift(mlo).astype(jnp.int32))
        dens[-1] = dens[-1] + shift(mde).astype(jnp.int32)
        return nums, dens

    def vbody(it, carry):
        nums = list(carry[:_N_PARTIAL])
        dens = list(carry[_N_PARTIAL:])
        for j in range(VU):
            nums, dens = vrow(1 + it * VU + j, nums, dens)
        return tuple(nums) + tuple(dens)

    z = jnp.zeros((H, WA), jnp.int32)
    res = jax.lax.fori_loop(0, hs // VU, vbody, (z,) * (2 * _N_PARTIAL))
    nums = list(res[:_N_PARTIAL])
    dens = list(res[_N_PARTIAL:])
    g.v0_tail(nums, dens, 0)
    g.finalize(nums, dens, out_ref)


def _kernel_sym_full(shifts_ref, out_ref, *, H, W, nimg, TEMPLATE=TEMPLATE,
                     SEARCH=SEARCH):
    """Fully-unrolled symmetric-weights NL-means.

    Same math as _kernel_sym (221 weight planes, each consumed at the +o
    and -o taps, weights bit-identical — shared via _SymGrid), but `v` is a
    Python constant instead of a fori_loop index, so the -o tap's
    v-dependent row shift is a STATIC slice of the weight plane — no per-v
    one-hot permutation matmul, no (H+hs, WA) staging buffers, no dynamic
    leading-dim index on shifts_ref. The program is ~5x larger (221
    unrolled offset bodies) but every op is a static-slice VPU op, giving
    Mosaic a single flat dependence graph to schedule.

    Output matches _kernel / _kernel_sym up to float num/den summation
    order (accumulation-order changes are verified parity-safe for the
    golden tracking output; see tools/golden_tpu.py).
    """
    g = _SymGrid(shifts_ref, H, W, nimg, TEMPLATE, SEARCH)
    hs, p, WA = g.hs, g.p, g.WA

    z = jnp.zeros((H, WA), jnp.int32)
    nums = [z] * _N_PARTIAL
    dens = [z] * _N_PARTIAL
    k = 0
    for v in range(1, hs + 1):
        A = shifts_ref[0, v]  # static leading-dim index
        for u in range(-hs, hs + 1):
            w, wi, wp, cp, wc = g.weights(A, u)
            # -o tap: output row x reads w row (x - v + hs), centre pixel
            # B row (x + p - v) — all offsets static because v, u are
            # Python constants here (vs _kernel_sym's matmul shift)
            wm = jax.lax.slice(wi, (hs - v, wc - u), (hs - v + H, wc - u + WA))
            cm = jax.lax.slice(g.Bi, (p - v, p - u), (p - v + H, p - u + WA))
            i, j = k % _N_PARTIAL, (k + 1) % _N_PARTIAL
            nums[i] = nums[i] + wp * cp
            dens[i] = dens[i] + wp
            nums[j] = nums[j] + wm * cm
            dens[j] = dens[j] + wm
            k += 2
    k = g.v0_tail(nums, dens, k)
    g.finalize(nums, dens, out_ref)


def _unroll_fits(W, nimg=2, TEMPLATE=TEMPLATE, SEARCH=SEARCH):
    """Whether the fully-unrolled kernel's packed width fits the v5e VMEM
    budget (it sits at ~112 MiB of 128 MiB for W=160, nimg=2)."""
    return nimg * (W + 2 * (SEARCH // 2 + TEMPLATE // 2)) <= 2 * 200


def _sym_call(img_packed, nimg, H, W, TEMPLATE, SEARCH, unroll=False):
    """img_packed: (G, Hpad, nimg*Wpad) reflect-padded strips -> (G, nimg,
    H, W) denoised."""
    G = img_packed.shape[0]
    ts = TEMPLATE // 2
    hs = SEARCH // 2
    HG = H + 2 * ts + hs
    Wtot = img_packed.shape[2]
    shifts = jnp.stack(
        [img_packed[:, v : v + HG, :] for v in range(hs + 1)], axis=1
    )
    if unroll and not _unroll_fits(W, nimg, TEMPLATE, SEARCH):
        # the unrolled kernel sits AT the VMEM ceiling for the current
        # 160x120 nimg=2 layout (~112 MiB scoped of v5e's 128 MiB); any
        # growth in packed width fails Mosaic's scoped-VMEM check with an
        # opaque budget error, so fail early with a real message instead
        # (the production batch rule auto-falls back via _unroll_fits)
        raise ValueError(
            f"unrolled NL-means kernel: packed width nimg={nimg} W={W} "
            "exceeds the v5e VMEM budget (~112 MiB at 160x120 nimg=2); "
            "use the fori-loop kernel (unroll=False) for wider layouts"
        )
    kernel = functools.partial(
        _kernel_sym_full if unroll else _kernel_sym,
        H=H, W=W, nimg=nimg, TEMPLATE=TEMPLATE, SEARCH=SEARCH,
    )
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, hs + 1, HG, Wtot),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, nimg, H, W), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((G, nimg, H, W), jnp.int32),
        # the fully-unrolled kernel's flat dependence graph lets Mosaic keep
        # more planes live: it needs a ~112M scoped budget (v5e has 128M)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(118 if unroll else 64) * 1024 * 1024
        ),
    )(shifts)


def nl_means_denoise_u8_pallas_sym(img_batch: jax.Array, *,
                                   TEMPLATE=TEMPLATE,
                                   SEARCH=SEARCH,
                                   unroll=False) -> jax.Array:
    """Symmetric-weights variant of nl_means_denoise_u8_pallas (same
    contract): (B, H, W) int 0..255 -> (B, H, W) int32 denoised."""
    B, H, W = img_batch.shape
    ts = TEMPLATE // 2
    p = SEARCH // 2 + ts
    x = img_batch.astype(jnp.float32)
    xpad = jnp.pad(x, ((0, 0), (p, p), (p, p)), mode="reflect")
    out = _sym_call(xpad, 1, H, W, TEMPLATE, SEARCH, unroll=unroll)
    return out.reshape(B, H, W)


def nl_means_denoise_u8_pallas_packed_sym(img_batch: jax.Array, *,
                                          TEMPLATE=TEMPLATE,
                                          SEARCH=SEARCH,
                                          unroll=False) -> jax.Array:
    """Lane-packed symmetric variant: pairs of images share one program's
    lane tiles (same packing as nl_means_denoise_u8_pallas_packed). Odd
    batches are padded with a copy of the last image."""
    B, H, W = img_batch.shape
    if B % 2:
        img_batch = jnp.concatenate([img_batch, img_batch[-1:]], axis=0)
    Bp = img_batch.shape[0]
    ts = TEMPLATE // 2
    p = SEARCH // 2 + ts
    x = img_batch.astype(jnp.float32)
    xpad = jnp.pad(x, ((0, 0), (p, p), (p, p)), mode="reflect")
    seg = W + 2 * p
    packed = xpad.reshape(Bp // 2, 2, H + 2 * p, seg)
    packed = jnp.concatenate([packed[:, 0], packed[:, 1]], axis=-1)
    out = _sym_call(packed, 2, H, W, TEMPLATE, SEARCH, unroll=unroll)
    return out.reshape(Bp, H, W)[:B]


def _kernel(shifts_ref, out_ref, *, H, W, TEMPLATE=TEMPLATE, SEARCH=SEARCH):
    ts = TEMPLATE // 2
    hs = SEARCH // 2
    Hb, Wb = H + 2 * ts, W + 2 * ts
    # base = un-shifted (dy=hs) rows at column offset hs
    base = shifts_ref[0, hs, :, hs : hs + Wb]

    DYU = _dy_unroll(SEARCH)

    def row_body(it, carry):
        nums = list(carry[:_N_PARTIAL])
        dens = list(carry[_N_PARTIAL:])
        k = 0
        for j in range(DYU):
            # (Hb, W + 2p): leading-dim dynamic index
            row = shifts_ref[0, it * DYU + j]
            for dx in range(SEARCH):
                sh = jax.lax.slice(row, (0, dx), (Hb, dx + Wb))
                d2 = (sh - base) ** 2
                cb = _box_cb(d2, H, W, TEMPLATE)
                w = _w_exact(cb, H_PARAM, TEMPLATE, SEARCH).astype(jnp.int32)
                centre = jax.lax.slice(sh, (ts, ts), (ts + H, ts + W)).astype(
                    jnp.int32
                )
                i = k % _N_PARTIAL
                nums[i] = nums[i] + w * centre
                dens[i] = dens[i] + w
                k += 1
        return tuple(nums) + tuple(dens)

    z = jnp.zeros((H, W), jnp.int32)
    res = jax.lax.fori_loop(0, SEARCH // DYU, row_body,
                            (z,) * (2 * _N_PARTIAL))
    num = res[0]
    for t in res[1:_N_PARTIAL]:
        num = num + t
    den = res[_N_PARTIAL]
    for t in res[_N_PARTIAL + 1:]:
        den = den + t
    # the centre (dy=hs, dx=hs) tap is part of the loop (dist 0 => w=fpm),
    # so num/den already include it and den >= fpm > 0
    out_ref[0] = jnp.clip(_div_round_i32(num, den), 0, 255)


def tpu_backend() -> bool:
    try:
        platform = jax.devices()[0].platform.lower()
    except RuntimeError:  # pragma: no cover
        return False
    return platform in ("tpu", "axon")


@jax.custom_batching.custom_vmap
def nl_means_denoise_u8_single(img: jax.Array) -> jax.Array:
    """(H, W) single-image wrapper. Under vmap (the batched clip scan), the
    custom batch rule routes to the lane-packed symmetric-weights kernel
    instead of a trivially-batched grid — shared VPU lane tiles + half the
    search offsets (~25% fewer tiles, ~24% faster than the non-symmetric
    packed kernel in the standalone probe), bit-identical output."""
    return nl_means_denoise_u8_pallas_sym(img[None])[0]


@nl_means_denoise_u8_single.def_vmap
def _nl_means_batch_rule(axis_size, in_batched, img):
    del axis_size
    if not in_batched[0]:  # pragma: no cover - unbatched under vmap
        return nl_means_denoise_u8_pallas_sym(img[None])[0], False
    # fully-unrolled kernel: A/B on v5e measured 0.153 vs 0.162 ms/img
    # (~6% faster, two rounds of tools/nlm_probe.py; weights bit-identical,
    # accumulation order verified parity-safe). Cold compile is ~1 min
    # slower but rides the persistent cache. The unrolled program sits at
    # the VMEM ceiling for the standard 160-wide packed-pair layout; wider
    # sensors fall back to the fori-loop kernel instead of failing the
    # Mosaic scoped-VMEM check.
    unroll = _unroll_fits(int(img.shape[-1]), nimg=2)
    return nl_means_denoise_u8_pallas_packed_sym(img, unroll=unroll), True


def nl_means_denoise_u8_pallas(img_batch: jax.Array, *, TEMPLATE=TEMPLATE,
                               SEARCH=SEARCH) -> jax.Array:
    """img_batch: (B, H, W) int 0..255 -> (B, H, W) int32 denoised."""
    B, H, W = img_batch.shape
    ts = TEMPLATE // 2
    p = SEARCH // 2 + ts
    Hb = H + 2 * ts
    x = img_batch.astype(jnp.float32)
    xpad = jnp.pad(x, ((0, 0), (p, p), (p, p)), mode="reflect")
    # (B, 21, Hb, W + 2p): the 21 vertical shifts
    shifts = jnp.stack(
        [xpad[:, dy : dy + Hb, :] for dy in range(SEARCH)], axis=1
    )
    kernel = functools.partial(_kernel, H=H, W=W, TEMPLATE=TEMPLATE,
                               SEARCH=SEARCH)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, SEARCH, Hb, W + 2 * p),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        # the unrolled body + 8 partial accumulators exceed the default
        # 16M scoped-vmem budget; v5e has 128M physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(shifts)


def _kernel_packed(shifts_ref, out_ref, *, H, W, seg, TEMPLATE=TEMPLATE, SEARCH=SEARCH):
    """Two images per program, packed side-by-side along the lane axis.

    Each image occupies a `seg`-wide strip of the packed row (its full
    reflect-padded width), so every dx slice of width seg+Wb covers both
    images' windows at fixed offsets 0 and seg — the arithmetic per image is
    identical to _kernel (bit-exact), but the VPU lane tiles are shared:
    ceil(352/128)=3 tiles for the pair instead of 2*ceil(166/128)=4.
    Columns [Wb, seg) of each strip are cross-image junk; they are computed
    but never read by the outputs.
    """
    ts = TEMPLATE // 2
    hs = SEARCH // 2
    Hb = H + 2 * ts
    Wb = W + 2 * ts
    Wk = seg + Wb  # packed working width: both windows + junk gap
    base = shifts_ref[0, hs, :, hs : hs + Wk]
    Wc = Wk - 2 * ts
    DYU = _dy_unroll(SEARCH)

    def row_body(it, carry):
        nums = list(carry[:_N_PARTIAL])
        dens = list(carry[_N_PARTIAL:])
        k = 0
        for j in range(DYU):
            row = shifts_ref[0, it * DYU + j]
            for dx in range(SEARCH):
                sh = jax.lax.slice(row, (0, dx), (Hb, dx + Wk))
                d2 = (sh - base) ** 2
                cb = _box_cb(d2, H, Wc, TEMPLATE)
                w = _w_exact(cb, H_PARAM, TEMPLATE, SEARCH).astype(jnp.int32)
                centre = jax.lax.slice(sh, (ts, ts), (ts + H, ts + Wc)).astype(
                    jnp.int32
                )
                i = k % _N_PARTIAL
                nums[i] = nums[i] + w * centre
                dens[i] = dens[i] + w
                k += 1
        return tuple(nums) + tuple(dens)

    z = jnp.zeros((H, Wc), jnp.int32)
    res = jax.lax.fori_loop(0, SEARCH // DYU, row_body,
                            (z,) * (2 * _N_PARTIAL))
    num = res[0]
    for t in res[1:_N_PARTIAL]:
        num = num + t
    den = res[_N_PARTIAL]
    for t in res[_N_PARTIAL + 1:]:
        den = den + t
    out = jnp.clip(_div_round_i32(num, den), 0, 255)
    out_ref[0, 0] = jax.lax.slice(out, (0, 0), (H, W))
    out_ref[0, 1] = jax.lax.slice(out, (0, seg), (H, seg + W))


def nl_means_denoise_u8_pallas_packed(img_batch: jax.Array, *,
                                      TEMPLATE=TEMPLATE,
                                      SEARCH=SEARCH) -> jax.Array:
    """Lane-packed variant: pairs of images share one program's lane tiles.
    Bit-identical to nl_means_denoise_u8_pallas; ~25% fewer VPU tiles at
    160x120. Odd batches are padded with a copy of the last image."""
    B, H, W = img_batch.shape
    if B % 2:
        img_batch = jnp.concatenate([img_batch, img_batch[-1:]], axis=0)
    Bp = img_batch.shape[0]
    ts = TEMPLATE // 2
    p = SEARCH // 2 + ts
    Hb = H + 2 * ts
    seg = W + 2 * p
    x = img_batch.astype(jnp.float32)
    xpad = jnp.pad(x, ((0, 0), (p, p), (p, p)), mode="reflect")
    packed = xpad.reshape(Bp // 2, 2, H + 2 * p, seg)
    packed = jnp.concatenate([packed[:, 0], packed[:, 1]], axis=-1)
    shifts = jnp.stack(
        [packed[:, dy : dy + Hb, :] for dy in range(SEARCH)], axis=1
    )
    kernel = functools.partial(_kernel_packed, H=H, W=W, seg=seg,
                               TEMPLATE=TEMPLATE, SEARCH=SEARCH)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // 2,),
        in_specs=[
            pl.BlockSpec(
                (1, SEARCH, Hb, 2 * seg),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 2, H, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp // 2, 2, H, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(shifts)
    return out.reshape(Bp, H, W)[:B]
