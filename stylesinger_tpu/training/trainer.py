"""Training loop driver.

Parity target: ``Trainer`` (``utils/trainer.py:90-340`` in
AaronZ345/StyleSinger): step loop to ``max_updates``, periodic validation +
checkpoint every ``val_check_interval``, scalar logging every
``tb_log_interval``, keep-K checkpoints with best-val copy, auto-resume from
the latest checkpoint, NaN watchdog.

Differences by design (TPU-native):
- no DDP process spawn: one process drives the whole mesh; the train step is
  SPMD over the ``data`` axis (``parallel/mesh.py``);
- no AMP/GradScaler: bf16 matmuls are native;
- curriculum phases re-jit the step at the (three) phase boundaries instead
  of branching every step;
- metrics go to ``<work_dir>/metrics.jsonl`` (+ TensorBoard when
  ``tensorboardX`` is importable).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stylesinger_tpu.parallel.mesh import make_mesh, shard_batch
from stylesinger_tpu.training.checkpoint import CheckpointManager
from stylesinger_tpu.training.schedules import check_diff_start_lr
from stylesinger_tpu.training.step import (
    Phase, init_state, make_eval_step, make_train_scan, make_train_step,
    phase_boundaries, phase_for_step,
)


class HostMemoryExceeded(RuntimeError):
    """Host RSS crossed ``max_host_rss_gb``; a checkpoint was saved first.

    Raised (instead of letting the kernel OOM killer SIGKILL the process
    mid-save, which leaves a corrupt ``*.orbax-checkpoint-tmp``) so the
    caller can exit with a restartable status — ``run.py train`` maps it
    to exit code 75 and ``--supervise`` restarts-and-resumes. Exists
    because long runs through remote-PJRT tunnels (axon) leak ~3 MB of
    host memory per dispatched step in the client library; the same loop
    on the local CPU backend is flat (measured, docs/OPS.md §Host-memory
    watchdog)."""


def host_rss_gb() -> float:
    """Resident-set size of this process in GB (Linux; 0.0 if unknown)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / (1024 * 1024)
    except OSError:
        pass
    return 0.0


def _is_remote_pjrt_backend() -> bool:
    """True when the device backend is a remote-PJRT tunnel (axon): the
    only backend class where the per-step host-RSS leak is known to occur
    (docs/OPS.md). Local cpu/gpu/tpu plugins don't leak per step."""
    try:
        import jax
        return jax.default_backend() not in ("cpu", "gpu", "tpu", "rocm",
                                             "cuda")
    except Exception:
        return False


def resolve_rss_limit_gb(cfg_value: float) -> float:
    """``max_host_rss_gb`` semantics: 0 = auto (arm at 85% of MemTotal
    ONLY when running on a remote-PJRT/tunnel backend; disabled on local
    backends so a legitimately high-memory local run is never interrupted),
    negative = disabled (inf), positive = explicit GB ceiling."""
    if cfg_value is None or cfg_value < 0:
        return float("inf")
    if cfg_value == 0 and not _is_remote_pjrt_backend():
        return float("inf")
    if cfg_value > 0:
        return float(cfg_value)
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal"):
                    return 0.85 * int(line.split()[1]) / (1024 * 1024)
    except OSError:
        pass
    return float("inf")


def _nonstrict_merge(target, loaded, path=""):
    """Copy leaves of ``loaded`` into ``target`` where the path exists with
    a matching shape; report what was dropped (reference non-strict load,
    utils/ckpt_utils.py:50-61)."""
    import numpy as np

    if not isinstance(target, dict) or not isinstance(loaded, dict):
        return target, []
    out, dropped = dict(target), []
    for k, v in loaded.items():
        p = f"{path}/{k}" if path else str(k)
        if k not in target:
            dropped.append(f"{p} (unknown key)")
        elif isinstance(v, dict):
            out[k], d = _nonstrict_merge(target[k], v, p)
            dropped += d
        elif np.shape(target[k]) != np.shape(v):
            dropped.append(f"{p} (shape {np.shape(v)} vs "
                           f"{np.shape(target[k])})")
        else:
            out[k] = jnp.asarray(v, jnp.asarray(target[k]).dtype)
    return out, dropped


def warm_start_params(params, load_path: str, cfg, codebook=None):
    """Initialize ``params`` (and, when given, the RQ-EMA ``codebook``
    collection — the style quantizer must stay matched to the encoder it
    was trained with) from another run's weights before training
    (reference ``load_ckpt`` hparam: egs_bases/config_base.yaml:27,
    applied strict=False at tasks/StyleSinger/stylesinger.py:36-37).

    ``load_path`` is either a reference torch ``.ckpt`` file (converted
    via stylesinger_tpu.convert) or a work dir with an orbax ``ckpt/``.
    Returns ``merged_params`` or ``(merged_params, merged_codebook)``
    depending on whether ``codebook`` was passed."""
    if load_path.endswith(".ckpt"):
        from stylesinger_tpu.convert import (
            convert_stylesinger, load_torch_checkpoint,
        )
        loaded_all = convert_stylesinger(load_torch_checkpoint(load_path),
                                         cfg)
    else:
        import orbax.checkpoint as ocp
        mgr = ocp.CheckpointManager(
            os.path.join(os.path.abspath(load_path), "ckpt"))
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"load_ckpt: no checkpoint under {load_path}/ckpt")
        # restore without a target: raw arrays in the saved tree layout
        loaded_all = mgr.restore(step)
    merged, dropped = _nonstrict_merge(params, loaded_all["params"])
    n_total = len(jax.tree.leaves(loaded_all["params"]))
    merged_cb = codebook
    if codebook is not None and loaded_all.get("codebook"):
        merged_cb, d_cb = _nonstrict_merge(codebook,
                                           loaded_all["codebook"],
                                           "codebook")
        n_total += len(jax.tree.leaves(loaded_all["codebook"]))
        dropped += d_cb
    print(f"| warm-start from {load_path}: {n_total - len(dropped)}/"
          f"{n_total} tensors loaded")
    for d in dropped[:20]:
        print(f"|   dropped {d}")
    if len(dropped) > 20:
        print(f"|   ... and {len(dropped) - 20} more")
    return merged if codebook is None else (merged, merged_cb)


class _BatchPrefetcher:
    """Background thread assembling + device-putting upcoming batches.

    The reference overlaps host-side batch assembly with the GPU step via
    DataLoader worker processes (``tasks/tts/tts_base.py:133-137``); the
    TPU-native equivalent is one thread that runs the numpy collate while
    the main thread's dispatched device step executes. The thread does
    HOST work only — the device transfer (`shard_batch`) stays on the
    consumer thread, because PJRT clients behind remote tunnels are not
    guaranteed to tolerate concurrent calls from two threads. Queue depth
    2 keeps one batch ready and one being assembled."""

    def __init__(self, it, reiterate, prep, depth: int = 2):
        import queue
        import threading

        self._q: Any = queue.Queue(maxsize=depth)
        self._it = it
        self._reiterate = reiterate
        self._prep = prep
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        try:
            while not self._stop.is_set():
                try:
                    b = next(self._it)
                except StopIteration:
                    self._it = iter(self._reiterate())
                    b = next(self._it)
                self._q.put(self._prep(b))
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
            self._q.put(None)

    def next(self):
        b = self._q.get()
        if b is None:
            raise self._err  # type: ignore[misc]
        return b

    def close(self):
        self._stop.set()
        # unblock a producer waiting on a full queue
        while not self._q.empty():
            try:
                self._q.get_nowait()
            except Exception:
                break


class MetricsWriter:
    def __init__(self, work_dir: str):
        os.makedirs(work_dir, exist_ok=True)
        self._f = open(os.path.join(work_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:  # optional; not a hard dependency
            from tensorboardX import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(os.path.join(work_dir, "tb"))
        except Exception:
            pass

    def write(self, step: int, metrics: Dict[str, Any],
              prefix: str = "train") -> None:
        row = {"step": step, "prefix": prefix,
               **{k: float(v) for k, v in metrics.items()}}
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), step)

    # media summaries — the reference's TensorBoard workflow (validation
    # mel/f0 figures + vocoded audio, tasks/StyleSinger/stylesinger.py:
    # 92-151, tasks/base_task.py:177-181)
    def write_image(self, tag: str, image, step: int) -> None:
        """image: [H, W, C] uint8/float array."""
        if self._tb is not None and image is not None:
            try:
                self._tb.add_image(tag, np.asarray(image), step,
                                   dataformats="HWC")
            except Exception:
                pass

    def write_audio(self, tag: str, wav, step: int,
                    sample_rate: int) -> None:
        """wav: 1-D float array in [-1, 1]. Encoded with the stdlib wave
        module (tensorboardX's own add_audio needs soundfile)."""
        if self._tb is None or wav is None:
            return
        try:
            import io
            import wave as wave_mod

            from tensorboardX.proto.summary_pb2 import Summary

            pcm = (np.clip(np.asarray(wav, np.float32), -1.0, 1.0) *
                   32767.0).astype("<i2")
            buf = io.BytesIO()
            with wave_mod.open(buf, "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(sample_rate)
                f.writeframes(pcm.tobytes())
            audio = Summary.Audio(
                sample_rate=sample_rate, num_channels=1,
                length_frames=len(pcm),
                encoded_audio_string=buf.getvalue(),
                content_type="audio/wav")
            self._tb._get_file_writer().add_summary(
                Summary(value=[Summary.Value(tag=tag, audio=audio)]), step)
        except Exception:
            pass

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class Trainer:
    def __init__(self, model, cfg: Any, work_dir: str,
                 mesh: Optional[Any] = None, vocoder: Optional[Any] = None):
        self.model = model
        self.cfg = cfg
        self.work_dir = work_dir
        self.mesh = mesh if mesh is not None else make_mesh()
        self.train_step = make_train_step(model, cfg)
        self.eval_step = make_eval_step(model, cfg)
        self.ckpt = CheckpointManager(
            work_dir, keep=cfg["num_ckpt_keep"], save_best=cfg["save_best"],
            milestone_interval=cfg.get("milestone_interval", 0))
        self.metrics = MetricsWriter(work_dir)
        self.rng = jax.random.PRNGKey(cfg["seed"])
        self.vocoder = vocoder  # optional: validation audio dumps

    # ------------------------------------------------------------------
    def fit(self, train_batches: Iterable[Dict],
            valid_batches_fn=None, max_updates: Optional[int] = None,
            example_batch: Optional[Dict] = None) -> Any:
        """Run training to ``max_updates``. ``train_batches`` must be an
        endless (or re-iterable) batch stream; ``valid_batches_fn()`` yields
        a fresh validation iterator per call."""
        c = self.cfg
        max_updates = max_updates or c["max_updates"]
        check_diff_start_lr(c)

        # debug-mode sanitizers (reference has only a NaN-grad watchdog,
        # utils/trainer.py:317-324; jax gives us trap-on-NaN compilation)
        if c.get("debug_nans", False):
            jax.config.update("jax_debug_nans", True)
        profile_at = c.get("profile_step", -1)

        it = iter(train_batches)
        if example_batch is None:
            example_batch = next(it)
        state = init_state(self.model, c, example_batch, self.rng)
        state, start = self.ckpt.restore(state)
        if start == 0 and c.get("load_ckpt", ""):
            # warm-start (reference `load_ckpt` hparam, strict=False:
            # tasks/StyleSinger/stylesinger.py:36-37 + utils/ckpt_utils.py
            # :50-61 — shape-mismatched/unknown keys are dropped with a log)
            wp, wcb = warm_start_params(state.params, c["load_ckpt"], c,
                                        codebook=state.codebook)
            state = state.replace(params=wp, codebook=wcb)
        step = start

        t0 = time.time()
        window_losses: Dict[str, list] = {}
        try:
            step, state = self._train_loop(
                it, train_batches, state, step, max_updates,
                valid_batches_fn, window_losses, t0)
        except KeyboardInterrupt:
            # reference saves on Ctrl-C too (utils/trainer.py:152-153)
            print(f"| KeyboardInterrupt: saving checkpoint at step {step}")
            self.ckpt.save(step, state)
            raise
        return state

    def _train_loop(self, it, train_batches, state, step, max_updates,
                    valid_batches_fn, window_losses, t0):
        c = self.cfg
        profile_at = c.get("profile_step", -1)
        if c.get("steps_per_dispatch", 1) > 1 and profile_at < 0:
            stacked = self._stack_batches(train_batches)
            if stacked is not None:
                return self._train_loop_scan(
                    stacked, state, step, max_updates, valid_batches_fn,
                    window_losses, t0)
        prefetch = None
        # default: overlap host collate with the device step, but only when
        # the host has a core to spare — on a 1-core box the producer
        # thread's GIL time comes straight out of the dispatch loop
        # (measured ~2x slowdown)
        default_prefetch = 2 if (os.cpu_count() or 1) > 1 else 0
        if c.get("prefetch_batches", default_prefetch) > 0:
            prefetch = _BatchPrefetcher(
                it, lambda: iter(train_batches), self._numeric,
                depth=c.get("prefetch_batches", default_prefetch))
        try:
            return self._train_loop_inner(
                it, train_batches, prefetch, state, step, max_updates,
                valid_batches_fn, window_losses, t0)
        finally:
            if prefetch is not None:
                prefetch.close()

    def _train_loop_inner(self, it, train_batches, prefetch, state, step,
                          max_updates, valid_batches_fn, window_losses, t0):
        c = self.cfg
        profile_at = c.get("profile_step", -1)
        rss_limit = resolve_rss_limit_gb(c.get("max_host_rss_gb", 0.0))
        while step < max_updates:
            if prefetch is not None:
                batch = shard_batch(prefetch.next(), self.mesh)
            else:
                try:
                    batch = next(it)
                except StopIteration:
                    it = iter(train_batches)
                    batch = next(it)
                batch = shard_batch(self._numeric(batch), self.mesh)
            phase = phase_for_step(step, c)
            if step == profile_at:  # one traced window for xprof
                jax.profiler.start_trace(
                    os.path.join(self.work_dir, "profile"))
            state, m = self.train_step(state, batch, self.rng, phase)
            if profile_at >= 0 and \
                    step == profile_at + c.get("profile_n_steps", 5):
                jax.block_until_ready(m)
                jax.profiler.stop_trace()
                try:  # per-op cost table from the captured device trace
                    from stylesinger_tpu.utils.profiling import (
                        _latest_trace, format_table, parse_trace,
                    )
                    tf = _latest_trace(os.path.join(self.work_dir,
                                                    "profile"))
                    if tf:
                        rows = parse_trace(tf)
                        n = c.get("profile_n_steps", 5)
                        for r in rows:
                            r["per_iter_us"] = r["total_us"] / n
                        print(format_table(rows, top=15))
                except Exception as e:  # never break training over a trace
                    print(f"| profile table unavailable: {e}")
            step += 1

            for k, v in m.items():
                window_losses.setdefault(k, []).append(v)
            t0 = self._log_val_save(step, state, phase, window_losses, t0,
                                    rss_limit, valid_batches_fn)
        return step, state

    def _log_val_save(self, step, state, phase, window_losses, t0,
                      rss_limit, valid_batches_fn):
        """Shared per-boundary bookkeeping for BOTH dispatch loops: metric
        drain + steps/s, host-RSS watchdog, non-finite-loss trap, and
        validation/checkpoint at the val cadence. ``phase`` is the phase of
        the just-completed step(s) — the scan dispatcher's windows never
        cross a curriculum boundary (see ``_window_len``), so passing the
        window's phase keeps the two dispatchers' validation streams
        identical at boundaries like ``forcing``. Returns the (possibly
        reset) log-window start time."""
        c = self.cfg
        if step % c["tb_log_interval"] == 0:
            logged = self._drain_window(window_losses)
            logged["steps_per_sec"] = c["tb_log_interval"] / \
                max(time.time() - t0, 1e-9)
            rss = host_rss_gb()
            logged["host_rss_gb"] = rss
            t0 = time.time()
            self.metrics.write(step, logged, "train")
            window_losses.clear()
            if not np.isfinite(logged.get("total_loss", 0.0)):
                raise FloatingPointError(
                    f"non-finite loss at step {step}: {logged}")
            if rss > rss_limit:
                print(f"| host RSS {rss:.1f} GB > limit {rss_limit:.1f} "
                      f"GB: checkpointing at step {step} and exiting "
                      "for restart")
                self.ckpt.save(step, state)
                raise HostMemoryExceeded(
                    f"host RSS {rss:.1f} GB exceeded {rss_limit:.1f} GB "
                    f"at step {step} (checkpoint saved; resume-safe)")

        if step % c["val_check_interval"] == 0:
            val_loss = None
            if valid_batches_fn is not None:
                val_loss = self.validate(state, valid_batches_fn(), step,
                                         phase)
            self.ckpt.save(step, state, val_loss)
        return t0

    # ----------------------------------------------- multi-step dispatch
    def _stack_batches(self, train_batches) -> Optional[tuple]:
        """Materialize one epoch of batches and upload them to the devices
        as ONE stacked pytree (leading axis = batch index, second axis =
        sentences, sharded over the 'data' mesh axis).

        Batches are zero-padded to a common signature (max over batches of
        each array dim); padded sentences are all-zero rows, exactly what
        the pow2 batch padding and `shard_batch` already produce, and are
        masked out downstream by txt_tokens==0 / mel2ph==0. Returns None
        (fall back to per-step dispatch) when the epoch exceeds the
        ``device_data_budget_mb`` config (default 1024) — the fast path
        targets corpus-resident training; giant corpora keep streaming."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        # materialize with a running (unpadded, lower-bound) byte count so
        # an over-budget — or accidentally endless — batch source bails out
        # early instead of exhausting host memory
        budget = float(self.cfg.get("device_data_budget_mb", 1024))
        batches, got_bytes = [], 0
        for b in iter(train_batches):
            b = self._numeric(b)
            batches.append(b)
            got_bytes += sum(np.asarray(v).nbytes for v in b.values())
            if got_bytes / 1e6 > budget:
                print(f"| steps_per_dispatch: epoch exceeds "
                      f"device_data_budget_mb {budget:.0f} after "
                      f"{len(batches)} batches; streaming per-step")
                return None
        if not batches:
            return None
        keys = sorted(set.intersection(*(set(b) for b in batches)))
        if any(np.asarray(b[k]).ndim == 0 for b in batches for k in keys):
            return None  # scalar fields: keep the per-step path
        dims: Dict[str, list] = {}
        for b in batches:
            for k in keys:
                a = np.asarray(b[k])
                dims.setdefault(k, [0] * a.ndim)
                dims[k] = [max(m, s) for m, s in zip(dims[k], a.shape)]
        n_dev = self.mesh.shape["data"]
        dims = {k: [v[0] + (-v[0]) % n_dev] + v[1:] for k, v in dims.items()}
        total_mb = sum(
            len(batches) * int(np.prod(d)) *
            np.asarray(batches[0][k]).dtype.itemsize
            for k, d in dims.items()) / 1e6
        if total_mb > budget:
            print(f"| steps_per_dispatch: epoch is {total_mb:.0f} MB > "
                  f"device_data_budget_mb {budget:.0f}; streaming per-step")
            return None

        def pad_to(a, shape):
            widths = [(0, t - s) for s, t in zip(a.shape, shape)]
            return np.pad(a, widths) if any(w for _, w in widths) else a

        stacked_np = {
            k: np.stack([pad_to(np.asarray(b[k]), dims[k]) for b in batches])
            for k in keys}
        sh = NamedSharding(self.mesh, P(None, "data"))
        stacked = {k: jax.device_put(v, sh) for k, v in stacked_np.items()}
        print(f"| steps_per_dispatch="
              f"{self.cfg.get('steps_per_dispatch', 1)}: "
              f"{len(batches)} batches ({total_mb:.0f} MB) device-resident")
        return stacked, len(batches)

    def _window_len(self, step: int, max_updates: int) -> int:
        """Longest window starting at ``step`` that stays inside one
        curriculum phase and lands exactly on the log/val boundaries."""
        c = self.cfg
        w = min(int(c.get("steps_per_dispatch", 1)), max_updates - step)
        for interval in (c["tb_log_interval"], c["val_check_interval"]):
            w = min(w, interval - step % interval)
        for b in phase_boundaries(c):
            if b > step:
                w = min(w, b - step)
        return max(w, 1)

    def _train_loop_scan(self, stacked_n, state, step, max_updates,
                         valid_batches_fn, window_losses, t0):
        """On-device multi-step training (see step.py::make_train_scan):
        one dispatch per window instead of per step. The batch schedule is
        deterministic in the global step (epoch = step // n_batches, order
        = seed+epoch permutation), so resume lands on the same stream."""
        c = self.cfg
        stacked, n_b = stacked_n
        train_scan = make_train_scan(self.model, c)
        rss_limit = resolve_rss_limit_gb(c.get("max_host_rss_gb", 0.0))
        perm_cache: Dict[int, np.ndarray] = {}

        def batch_index(t: int) -> int:
            epoch = t // n_b
            if epoch not in perm_cache:
                perm_cache.clear()  # only the current window's epochs
                perm_cache[epoch] = np.random.default_rng(
                    c["seed"] + epoch).permutation(n_b)
            return int(perm_cache[epoch][t % n_b])

        while step < max_updates:
            w = self._window_len(step, max_updates)
            order = np.fromiter((batch_index(t) for t in range(step,
                                                               step + w)),
                                np.int32, count=w)
            phase = phase_for_step(step, c)
            state, m = train_scan(state, stacked, jnp.asarray(order),
                                  self.rng, phase)
            step += w
            for k, v in m.items():
                window_losses.setdefault(k, []).append(v)
            t0 = self._log_val_save(step, state, phase, window_losses, t0,
                                    rss_limit, valid_batches_fn)
        return step, state

    @staticmethod
    def _drain_window(window_losses: Dict[str, list]) -> Dict[str, float]:
        """Average the logging window's metrics with ONE device→host pull.

        Each train step leaves ~14 scalar device arrays in the window;
        fetching them one `np.asarray` at a time costs a full transfer
        round trip per scalar, which through a remote PJRT tunnel dominates
        the step loop (~0.2 s/step measured at tb_log_interval=50). A
        single on-device `jnp.stack` collapses the whole window into one
        array pull."""
        keys = sorted(window_losses)
        raw = [v for k in keys for v in window_losses[k]]
        try:
            # entries are scalars (per-step dispatch) or [W] vectors (scan
            # dispatch); flatten both into one on-device concat
            flat = [jnp.atleast_1d(jnp.asarray(v, jnp.float32))
                    for v in raw]
            sizes = [int(v.shape[0]) for v in flat]
            vals = np.asarray(jnp.concatenate(flat))
        except Exception:  # host-only/ragged values: fall back per-scalar
            flat = [np.atleast_1d(np.asarray(v, np.float32)) for v in raw]
            sizes = [int(v.shape[0]) for v in flat]
            vals = np.concatenate(flat)
        logged, i, j = {}, 0, 0
        for k in keys:
            n = sum(sizes[j:j + len(window_losses[k])])
            j += len(window_losses[k])
            logged[k] = float(vals[i:i + n].mean())
            i += n
        return logged

    # ------------------------------------------------------------------
    def validate(self, state, batches: Iterable[Dict], step: int,
                 phase: Phase) -> float:
        sums: Dict[str, float] = {}
        n = 0
        first_batch = None
        for batch in batches:
            batch = shard_batch(self._numeric(batch), self.mesh)
            if first_batch is None:
                first_batch = batch
            losses = self.eval_step(state, batch, self.rng, phase)
            for k, v in losses.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        avg = {k: v / max(n, 1) for k, v in sums.items()}
        self.metrics.write(step, avg, "valid")
        if first_batch is not None and \
                step % self.cfg.get("valid_infer_interval", 5000) == 0:
            try:
                self._dump_valid_artifacts(state, first_batch, step)
            except Exception as e:  # plots must never kill training
                print(f"| valid plot failed: {e}")
        return avg.get("total_loss", 0.0)

    def _dump_valid_artifacts(self, state, batch: Dict, step: int) -> None:
        """Rendered mel/f0 figures (+ vocoded audio when a vocoder is
        attached), the reference's TensorBoard media summaries
        (tasks/StyleSinger/stylesinger.py:92-151)."""
        from stylesinger_tpu.dsp.mel import save_wav
        from stylesinger_tpu.utils.plot import (
            f0_to_figure, figure_to_image, spec_to_figure,
        )

        out_dir = os.path.join(self.work_dir, "valid_plots")
        os.makedirs(out_dir, exist_ok=True)
        variables = {"params": state.params, "codebook": state.codebook}
        ret = self.model.apply(
            variables, batch["txt_tokens"], None, batch["spk_embed"],
            batch.get("emo_embed"), batch["mels"], batch["f0"], None, None,
            batch["notes"], batch["note_durs"], batch["note_types"],
            infer=True, use_diff=True,
            max_frames=int(batch["mels"].shape[1]),
            rngs={"diffusion": self.rng, "rq": self.rng})
        mel = np.asarray(ret["mel_out"])[0]
        f0 = np.asarray(ret["f0_denorm"])[0]
        n = int(np.asarray((ret["mel2ph"][0] > 0)).sum())
        img = figure_to_image(spec_to_figure(mel[: max(n, 1)],
                                             title=f"step {step}"))
        try:
            import matplotlib.pyplot as plt  # noqa: F401
            import imageio  # type: ignore
            imageio.imwrite(os.path.join(out_dir, f"mel_{step}.png"), img)
        except Exception:
            np.save(os.path.join(out_dir, f"mel_{step}.npy"),
                    mel[: max(n, 1)])
        self.metrics.write_image("valid/mel", img, step)
        f0_img = figure_to_image(f0_to_figure(f0[: max(n, 1)]))
        self.metrics.write_image("valid/f0", f0_img, step)
        if self.vocoder is not None and n > 0:
            wav = self.vocoder.spec2wav(mel[:n], f0=f0[:n])
            save_wav(wav, os.path.join(out_dir, f"wav_{step}.wav"),
                     self.cfg["audio_sample_rate"])
            self.metrics.write_audio("valid/wav", wav, step,
                                     self.cfg["audio_sample_rate"])
        self.metrics.flush()

    @staticmethod
    def _numeric(batch: Dict) -> Dict:
        return {k: v for k, v in batch.items()
                if isinstance(v, (np.ndarray, jnp.ndarray))
                and k not in ("nsamples",)}
