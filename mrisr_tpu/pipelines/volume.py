"""Full-volume batch inference: NIfTI -> slices -> SR -> restack.

BASELINE.json config 5: volumes are sliced along the chosen axis, windows
applied, slices padded to the model resolution, batched, mesh-sharded across
the data axis (v5e-8), super-resolved by any pipeline exposing
``super_resolve(lr, key, ...)``, then restacked and written back as NIfTI
with the source affine.  The slice batches are the unit of data parallelism
(SURVEY.md §5 long-context note: "sequence length" here = slices/volume).
"""
from __future__ import annotations

from collections import Counter
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mrisr_tpu.data.nifti import NiftiImage, read_nifti, to_ras, write_nifti
from mrisr_tpu.data.slices import clip_to_unit_interval, pad_or_center_crop, to_minus_one_one

# Last grouped-dispatch phase breakdown (prep/upload/chain/download seconds),
# populated when MRISR_VOLUME_TRACE=1 — read by tools/perf_volume.py to
# record the phase split in its JSON artifact.
LAST_TRACE: dict | None = None


def volume_to_model_slices(
    vol: np.ndarray,
    axis: int = 2,
    resolution: int = 256,
    clip: tuple[float, float] = (0, 1000),
) -> tuple[np.ndarray, list[tuple[int, int]]]:
    """-> (slices [N, R, R, 1] in [-1,1], original (H, W) per slice)."""
    slices, shapes = [], []
    for i in range(vol.shape[axis]):
        sl = [slice(None)] * vol.ndim
        sl[axis] = i
        img = vol[tuple(sl)]
        shapes.append(img.shape)
        img = to_minus_one_one(clip_to_unit_interval(img, clip))
        img = pad_or_center_crop(img, (resolution, resolution), pad_value=-1.0)
        slices.append(img[..., None])
    return np.stack(slices).astype(np.float32), shapes


def restack_slices(
    sr_slices: np.ndarray, shapes: list[tuple[int, int]], axis: int = 2
) -> np.ndarray:
    """Undo the pad/crop per slice and stack back into a volume ([0,1]).

    Accepts non-square slice stacks too (the volume driver may have already
    cropped the model-resolution padding off on device — PERF.md round-12).
    """
    rh, rw = sr_slices.shape[1:3]
    h0, w0 = shapes[0]
    if all(s == (h0, w0) for s in shapes) and h0 <= rh and w0 <= rw:
        # Uniform-shape volume (the common case): one vectorized crop +
        # rescale instead of a per-slice Python loop (PERF.md round-12:
        # restack+IO is ~0.5 s of an 8.6 s volume even vectorized).
        ph, pw = (rh - h0) // 2, (rw - w0) // 2
        vol = (sr_slices[:, ph : ph + h0, pw : pw + w0, 0] + 1.0) / 2.0
        return np.moveaxis(vol, 0, axis)
    out = []
    for i, (h, w) in enumerate(shapes):
        img = sr_slices[i, ..., 0]
        # Per-dimension undo of pad_or_center_crop: an original dim <= the
        # model resolution was center-PADDED going in (crop the center back
        # out); a dim > the resolution was center-CROPPED (place the SR
        # patch back at the canvas center, border filled with -1 = black in
        # [-1,1] space, matching the input side's pad_value=-1).  The two
        # cases are independent per dim — a (20, 12) slice at resolution 16
        # is cropped in h AND padded in w (regression-tested in
        # tests/test_volume_chains.py).
        if h <= rh:
            img = img[(rh - h) // 2 : (rh - h) // 2 + h, :]
        if w <= rw:
            img = img[:, (rw - w) // 2 : (rw - w) // 2 + w]
        if img.shape != (h, w):
            canvas = np.full((h, w), -1.0, img.dtype)
            oh, ow = (h - img.shape[0]) // 2, (w - img.shape[1]) // 2
            canvas[oh : oh + img.shape[0], ow : ow + img.shape[1]] = img
            img = canvas
        out.append((img + 1.0) / 2.0)
    return np.stack(out, axis=axis)


def super_resolve_volume(
    pipeline,
    nifti_path: str | Path,
    out_path: str | Path | None = None,
    axis: int = 2,
    resolution: int = 256,
    batch_size: int = 8,
    num_steps: int = 50,
    clip: tuple[float, float] = (0, 1000),
    mesh=None,
    seed: int = 0,
    dtype=None,
    chain_group: int | None = None,
) -> NiftiImage:
    """End-to-end driver.  ``pipeline.super_resolve`` runs per sharded batch.

    ``dtype=None`` infers the activation dtype from the pipeline's params so
    a bf16 pipeline is fed bf16 slices — feeding the fp32 host slices
    directly would silently promote the whole sampling chain to fp32
    (slower, and the fp32 flash tiles need smaller blocks).

    ``chain_group=G`` (default env ``MRISR_VOLUME_CHAINS``, else 1) dispatches
    G chains per device call via ``pipeline.super_resolve_many`` — one upload,
    one program, one download per G chains, amortizing the fixed per-dispatch
    host/RPC overhead (PERF.md round-7).  The slice count is padded to a
    multiple of G*batch_size by repeating the last slice (one wasted chain at
    worst) so a single compiled program serves the whole volume.
    """
    import os
    import time as _time

    trace = os.environ.get("MRISR_VOLUME_TRACE", "0") == "1"
    _marks: list[tuple[str, float]] = [("start", _time.perf_counter())]

    def _mark(name: str) -> None:
        if trace:
            _marks.append((name, _time.perf_counter()))

    img = to_ras(read_nifti(nifti_path))
    vol = img.data
    _mark("read_nifti")
    if dtype is None:
        # Majority leaf dtype = the trunk's activation dtype even for mixed
        # trees (e.g. fp32 norm scales inside a bf16 tree, where leaves[0]
        # would depend on iteration order — ADVICE round-1); the explicit
        # ``dtype=`` argument stays the escape hatch.
        leaves = jax.tree_util.tree_leaves(getattr(pipeline, "unet_params", None))
        if leaves:
            counts = Counter(l.dtype for l in leaves)
            dtype = counts.most_common(1)[0][0]
        else:
            dtype = np.float32

    n = vol.shape[axis]
    pad_to = -(-n // batch_size) * batch_size
    shapes: list = [None] * n

    def _prep_batch(s: int) -> np.ndarray:
        """window/pad one batch of slices (runs on the prefetch thread so
        host preprocessing overlaps the device chain — round-2 serving-gap
        work; padding batches repeat the last slice)."""
        arrs = []
        for i in range(s, s + batch_size):
            j = min(i, n - 1)
            sl = [slice(None)] * vol.ndim
            sl[axis] = j
            im = to_minus_one_one(clip_to_unit_interval(vol[tuple(sl)], clip))
            if i < n:
                shapes[i] = im.shape
            im = pad_or_center_crop(im, (resolution, resolution), pad_value=-1.0)
            arrs.append(im[..., None])
        return np.stack(arrs).astype(np.float32)

    key = jax.random.PRNGKey(seed)
    # Host/device overlap structure: slice preprocessing AND the
    # host->device upload run ahead on a prefetch thread, result DOWNLOADS
    # run on a second thread, and — critically — each 50-step chain is
    # DRAINED (blocked) before the next one is dispatched.  The axon relay
    # does not pipeline un-drained async dispatches (PERF.md round-5: an
    # async aggregate measured 3-4x slower than blocked chains), so the
    # earlier window=4 async pattern actively serialised the device work;
    # blocked chains with threaded upload/download keep the chip busy and
    # hide the ~tens-of-ms tunnel transfers behind the current chain.
    # ``MRISR_VOLUME_ASYNC_WINDOW > 0`` restores the old pattern for A/B.
    # Results come back in the device dtype (bf16 = half the tunnel bytes)
    # and are widened to fp32 on the host.
    from concurrent.futures import ThreadPoolExecutor

    window = int(os.environ.get("MRISR_VOLUME_ASYNC_WINDOW", "0"))
    threads = os.environ.get("MRISR_VOLUME_THREADS", "0") == "1"
    if chain_group is None:
        chain_group = int(os.environ.get("MRISR_VOLUME_CHAINS", "1"))
    grouped = (
        chain_group > 1
        and hasattr(pipeline, "super_resolve_group")
        and not threads
        and window <= 0
    )

    def _fetch(sr) -> np.ndarray:
        return np.asarray(sr).astype(np.float32)

    def _prep_upload(s: int):
        batch = jnp.asarray(_prep_batch(s), dtype)
        if mesh is not None:
            from mrisr_tpu.parallel.mesh import batch_sharding

            batch = jax.device_put(batch, batch_sharding(mesh, 4))
        batch.block_until_ready()
        return batch

    starts = list(range(0, pad_to, batch_size))
    if threads or window > 0:
        # Threaded upload/download overlap.  Measured NET NEGATIVE through
        # the axon relay (37.2 s for a 128-slice volume vs ~13 s expected
        # from the bench steady state): concurrent upload/download RPCs
        # stall the in-flight chain instead of hiding behind it.  Kept
        # behind MRISR_VOLUME_THREADS for A/B and for direct-attached
        # (non-relay) deployments, where host/device overlap is the
        # normal win.
        with ThreadPoolExecutor(max_workers=1) as prep_ex, ThreadPoolExecutor(
            max_workers=1
        ) as fetch_ex:
            preps = [prep_ex.submit(_prep_upload, s) for s in starts]
            fetches: list = []
            for s, fut in zip(starts, preps):
                sr = pipeline.super_resolve(fut.result(), jax.random.fold_in(key, s), num_steps)
                if window <= 0:
                    sr.block_until_ready()
                fetches.append(fetch_ex.submit(_fetch, sr))
                if window > 0 and len(fetches) >= window:
                    fetches[-window].result()
            outs = [f.result() for f in fetches]
    elif grouped:
        # Grouped dispatch: G chains per program via super_resolve_many.
        # Pad the start list to a multiple of G (repeat the last start) so
        # one compiled program serves every group — a wasted chain is ~0.5 s;
        # a second compile through the relay is minutes.
        G = chain_group
        padded = starts + [starts[-1]] * (-len(starts) % G)
        outs_map: dict[int, np.ndarray] = {}
        ph = {"prep": 0.0, "upload": 0.0, "chain": 0.0, "download": 0.0}
        # Download path (PERF.md round-12 + tools/perf_fetch.py): the tunnel downloads
        # ~26 MB/s single-stream but ~35 MB/s over 8 concurrent chunk
        # fetches, and the host-side crop to the original slice shape can
        # run on device first (0.74x bytes for a 220^2 volume).  Both are
        # post-drain (no in-flight chain to stall, unlike the round-6
        # threaded-overlap negative result).
        fetch_threads = int(os.environ.get("MRISR_FETCH_THREADS", "8"))
        dev_crop = os.environ.get("MRISR_VOLUME_DEVICE_CROP", "1") == "1"
        # MRISR_VOLUME_OVERLAP=1: download group i on a worker thread WHILE
        # chain i+1 runs on device.  Differs from the round-6 negative
        # (MRISR_VOLUME_THREADS): the chain is still drained before the
        # next dispatch — only the post-drain DOWNLOAD overlaps the next
        # chain, so the in-flight chain itself has no concurrent upload RPC.
        # Whether the relay serializes a download against the next chain's
        # execution is exactly the A/B tools/perf_volume.py runs
        # (VERDICT round-4 next #6); phase accounting for the overlapped
        # download is measured inside the worker and reported as
        # "download" (concurrent seconds, not critical-path seconds).
        overlap = os.environ.get("MRISR_VOLUME_OVERLAP", "0") == "1"

        def _fetch_many(sr) -> np.ndarray:
            k = min(fetch_threads, sr.shape[0])
            # Largest k that divides the group count: equal-size chunks mean
            # ONE sliced shape, hence one compiled slice program through the
            # relay (ADVICE round-3: linspace bounds gave mixed sizes for
            # G % k != 0, compiling several programs on the first volume).
            while k > 1 and sr.shape[0] % k:
                k -= 1
            if k <= 1:
                return _fetch(sr)
            bounds = np.linspace(0, sr.shape[0], k + 1, dtype=int)
            with ThreadPoolExecutor(max_workers=k) as ex:
                parts = list(
                    ex.map(
                        lambda ij: np.asarray(sr[ij[0] : ij[1]]),
                        zip(bounds[:-1], bounds[1:]),
                    )
                )
            return np.concatenate(parts).astype(np.float32)

        crop_fn = None
        fetch_futs: list = []
        fetch_ex = ThreadPoolExecutor(max_workers=1) if overlap else None

        def _timed_fetch(sr_arr, grp_list):
            w0 = _time.perf_counter()
            host_arr = _fetch_many(sr_arr)
            return host_arr, grp_list, _time.perf_counter() - w0

        for gi in range(0, len(padded), G):
            grp = padded[gi : gi + G]
            t0 = _time.perf_counter()
            host_stack = np.stack([_prep_batch(s) for s in grp])
            t1 = _time.perf_counter()
            stack = jnp.asarray(host_stack, dtype)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                stack = jax.device_put(
                    stack, NamedSharding(mesh, P(None, "data", None, None, None))
                )
            keys = jnp.stack([jax.random.fold_in(key, s) for s in grp])
            stack.block_until_ready()
            t2 = _time.perf_counter()
            sr = pipeline.super_resolve_group(stack, keys, num_steps)
            sr.block_until_ready()
            t3 = _time.perf_counter()
            if dev_crop and crop_fn is None:
                # A volume's slices all share one shape; crop back to it on
                # device so the tunnel moves 0.74x bytes (220^2 vs 256^2).
                # restack_slices sees r == h0 and its crop is a no-op.
                h0, w0 = shapes[grp[0]]
                if h0 <= resolution and w0 <= resolution and (h0, w0) != (
                    resolution,
                    resolution,
                ):
                    ch, cw = (resolution - h0) // 2, (resolution - w0) // 2
                    crop_fn = jax.jit(
                        lambda a: a[:, :, ch : ch + h0, cw : cw + w0, :]
                    )
                else:
                    dev_crop = False
            if crop_fn is not None:
                sr = crop_fn(sr)
                sr.block_until_ready()
            ph["prep"] += t1 - t0
            ph["upload"] += t2 - t1
            ph["chain"] += t3 - t2
            if overlap:
                # Hand the download to the worker; the next iteration's
                # chain dispatches immediately.
                fetch_futs.append(fetch_ex.submit(_timed_fetch, sr, list(grp)))
            else:
                host = _fetch_many(sr)
                ph["download"] += _time.perf_counter() - t3
                for g, s in enumerate(grp):
                    outs_map.setdefault(s, host[g])
        if overlap:
            for fut in fetch_futs:
                host, grp_list, dl = fut.result()
                ph["download"] += dl
                for g, s in enumerate(grp_list):
                    outs_map.setdefault(s, host[g])
            fetch_ex.shutdown()
        outs = [outs_map[s] for s in starts]
        if trace:
            global LAST_TRACE
            LAST_TRACE = dict(ph, overlap=float(overlap))
            print(
                "volume trace grouped: "
                + " ".join(f"{k}={v:.3f}s" for k, v in ph.items()),
                flush=True,
            )
    else:
        # Strict serial: prep -> upload -> chain (blocked) -> download.
        # Through the relay every concurrent RPC pattern measured slower
        # (PERF.md round-6 volume A/B); the honest floor is the bench
        # steady-state plus the per-chain transfer overhead.
        outs = []
        for s in starts:
            sr = pipeline.super_resolve(_prep_upload(s), jax.random.fold_in(key, s), num_steps)
            sr.block_until_ready()
            outs.append(_fetch(sr))
    sr_all = np.concatenate(outs)[:n]
    _mark("chains_done")

    vol = restack_slices(sr_all, shapes, axis)
    result = NiftiImage(data=vol.astype(np.float32), affine=img.affine, header=img.header)
    _mark("restack")
    if out_path is not None:
        write_nifti(out_path, result.data, result.affine)
    _mark("write_nifti")
    if trace:
        segs = " ".join(
            f"{b}={t1 - t0:.3f}s"
            for (_, t0), (b, t1) in zip(_marks, _marks[1:])
        )
        print(f"volume trace phases: {segs}", flush=True)
    return result
