"""Host featurization worker: SystemFeaturizer in a clean subprocess.

Why a subprocess (two independent reasons):
  * On multi-core hosts this is the dataloader-worker pattern of the
    reference's training harness (Uni-Core workers; SURVEY 2.5 "host
    embarrassing parallel"): featurization runs off the device-owning
    process and can overlap device compute.
  * Under the tunneled single-core TPU environment it is a functional
    necessity: the PJRT client registered by the TPU sitecustomize runs
    relay/claim threads for the life of the process and multiplies the
    wall time of ANY host numpy work by 5-20x (measured:
    scripts/tpu_client_cpu_probe.py — identical numpy burst 0.8 s in a
    clean process, 4.4 s in the client process before jax is even
    touched; warm featurizer loads 0.6 s clean vs 8-30 s in-client).
    The worker strips the sitecustomize path so featurization runs at
    clean-process speed.

Protocol: length-prefixed pickles over stdin/stdout.  Every work request
carries a monotonically increasing request id which the worker echoes in
the response; `result()` asserts the echoed id matches the oldest
outstanding submission, so a half-drained queue (e.g. after a dock_many
failure mid-loop) can never silently pair a response with the wrong
system.  Requests:
  ("init", data_cfg, featurizer_kwargs)          -> "ready"
  ("load", rid, system, load_kwargs, num_confs|None, conf_seed, compact)
      -> ("ok", rid, (feats, meta, confs|None)) | ("err", rid, traceback)
  ("post", rid, poses, args)                     -> same envelope
  ("stop",)                                      -> process exits

With compact=True the worker ships the int8 transport form
(model/compact.compact_batch_np; per-round MSA pre-compacted into
meta["batch_msa_feat_c"]): ~1 MB over the pipe instead of ~40 MB, and
the device-owning parent never touches fat numpy at all.

Conformer generation (the other CPU-heavy stage of the guided dock) runs
in the worker for the same reason, keyed off the loaded ref_mol.
"""

from __future__ import annotations

import os
import pickle
import queue
import struct
import subprocess
import sys
import threading
import traceback
from collections import deque
from typing import Optional


def _send(f, obj) -> None:
    data = pickle.dumps(obj, protocol=4)
    f.write(struct.pack("<Q", len(data)))
    f.write(data)
    f.flush()


def _recv(f, timing: Optional[dict] = None):
    """Read one length-prefixed pickle.  `timing` (if given) splits the
    wall into header wait (worker latency) vs payload read + unpickle
    (parent-side cost — the part the PJRT client's relay threads can
    multiply), to attribute pass-leading load stalls."""
    import time as _time

    t0 = _time.perf_counter()
    hdr = f.read(8)
    t1 = _time.perf_counter()
    if len(hdr) < 8:
        raise EOFError("featurizer worker pipe closed")
    (n,) = struct.unpack("<Q", hdr)
    buf = f.read(n)
    if len(buf) < n:
        raise EOFError("featurizer worker pipe truncated")
    obj = pickle.loads(buf)
    if timing is not None:
        timing["wait_s"] = round(t1 - t0, 3)
        timing["read_s"] = round(_time.perf_counter() - t1, 3)
        timing["mb"] = round(n / 1e6, 2)
    return obj


class FeaturizerWorker:
    """Proxy for SystemFeaturizer.load (+ conformer bank) in a clean
    subprocess.  Mirrors the featurizer's constructor surface; `load`
    returns (feats, meta) like the inline featurizer, with the optional
    conformer bank precomputed when `num_confs` is given."""

    def __init__(self, data_cfg, **featurizer_kwargs):
        self._ctor = (data_cfg, featurizer_kwargs)
        self._spawn()
        # mirrored for pipeline attribute checks
        self.use_x_gt_ligand_as_ref_pos = bool(
            featurizer_kwargs.get("use_x_gt_ligand_as_ref_pos", False)
        )

    def _spawn(self) -> None:
        data_cfg, featurizer_kwargs = self._ctor
        env = dict(os.environ)
        pkg_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        paths = [
            p
            for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        ]
        env["PYTHONPATH"] = os.pathsep.join([pkg_root] + paths)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "physdock_tpu.data.feat_worker"],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            env=env,
        )
        self._alive = True
        self._next_id = 0
        self._pending: "deque[int]" = deque()  # rids submitted, not drained
        # all requests go through a writer thread: a large request (e.g. the
        # ~1 MB pose array of submit_post) would otherwise block the caller
        # on the 64 KB stdin pipe while the worker is itself blocked writing
        # a pending result that the caller has not drained yet -> deadlock
        self._wq: "queue.Queue" = queue.Queue()
        self._writer = threading.Thread(target=self._write_loop, daemon=True)
        self._writer.start()
        self._enqueue(("init", data_cfg, featurizer_kwargs))
        ready = _recv(self.proc.stdout)
        assert ready == "ready", ready

    def respawn(self) -> None:
        """Tear down and restart the worker, discarding any undrained
        responses.  Callers that abandon queued work mid-protocol (e.g. a
        dock_many failure before all results were drained) MUST respawn
        before reusing the worker, or the next result() would raise a
        request-id mismatch."""
        self._alive = False
        try:
            self._wq.put(None)
            self.proc.kill()
            self.proc.wait(timeout=10)
        except Exception:
            pass
        self._spawn()

    def _write_loop(self) -> None:
        while True:
            item = self._wq.get()
            if item is None:
                return
            try:
                _send(self.proc.stdin, item)
            except Exception:
                return  # worker died; reader side surfaces the error

    def _enqueue(self, msg) -> None:
        self._wq.put(msg)

    def submit(
        self,
        system,
        num_confs: Optional[int] = None,
        conf_seed: int = 0,
        compact: bool = False,
        **kw,
    ) -> int:
        """Queue a load; the worker computes it while the caller does device
        work (prefetch).  Results come back in submission order via
        `result()`.  Returns the request id."""
        rid = self._next_id
        self._next_id += 1
        self._pending.append(rid)
        self._enqueue(("load", rid, system, kw, num_confs, conf_seed, compact))
        return rid

    def result(self, expect: Optional[int] = None):
        """Drain the next response.  `expect` pins the response to a specific
        submit()'s request id; responses for older (abandoned) requests are
        discarded, so a caller that lost track of queued work mid-failure can
        still pair load/result correctly.  Without `expect`, the oldest
        outstanding request is assumed (strict FIFO drain)."""
        if not self._pending:
            raise RuntimeError("featurizer worker: result() with no pending request")
        if expect is None:
            expect = self._pending[0]
        if expect not in self._pending:
            raise RuntimeError(
                f"featurizer worker: request {expect} already drained"
            )
        while True:
            self.last_recv: dict = {}
            status, rid, payload = _recv(self.proc.stdout, timing=self.last_recv)
            if rid not in self._pending:
                raise RuntimeError(
                    f"featurizer worker protocol desync: response {rid} "
                    f"was never pending"
                )
            if rid < expect:
                self._pending.remove(rid)  # stale abandoned request
                continue
            if rid > expect:
                raise RuntimeError(
                    f"featurizer worker protocol desync: expected response "
                    f"{expect}, got {rid}"
                )
            self._pending.remove(rid)
            if status != "ok":
                raise RuntimeError(f"featurizer worker failed:\n{payload}")
            return payload  # (feats, meta, confs | None)

    def load(self, system, **kw):
        rid = self.submit(system, **kw)
        return self.result(rid)

    def submit_post(self, poses, args: dict) -> int:
        """Queue pose postprocessing (align/rank/score — pure numpy) in the
        worker.  FIFO with loads: dock_many queues all loads first, so load
        responses drain during the dock loop and post responses after it.
        Returns the request id."""
        rid = self._next_id
        self._next_id += 1
        self._pending.append(rid)
        self._enqueue(("post", rid, poses, args))
        return rid

    def stop(self) -> None:
        if self._alive:
            self._alive = False
            try:
                self._enqueue(("stop",))
                self._wq.put(None)
                self._writer.join(timeout=10)
                self.proc.wait(timeout=10)
            except Exception:
                self.proc.kill()

    def __del__(self):  # pragma: no cover - best effort
        try:
            self.stop()
        except Exception:
            pass


def _cache_key(data_cfg, fz_kwargs, system, kw, num_confs, conf_seed, compact):
    """Disk-cache key for a featurized system: config + load kwargs + the
    system file's content hash + the featurizer code's mtimes (so code
    changes invalidate stale entries automatically)."""
    import hashlib

    h = hashlib.md5()
    h.update(repr(data_cfg).encode())
    h.update(repr(sorted(fz_kwargs.items())).encode())
    h.update(repr(sorted(kw.items())).encode())
    h.update(repr((num_confs, conf_seed, compact)).encode())
    if isinstance(system, str) and os.path.exists(system):
        with open(system, "rb") as f:
            h.update(hashlib.md5(f.read()).digest())
    else:
        h.update(repr(system).encode())
    import physdock_tpu.data.feature_loader as _fl
    import physdock_tpu.model.compact as _mc

    for mod in (_fl, _mc):
        h.update(str(os.path.getmtime(mod.__file__)).encode())
    return h.hexdigest()


def _serve() -> None:
    from physdock_tpu.data.feature_loader import SystemFeaturizer

    inp = sys.stdin.buffer
    out = sys.stdout.buffer
    # anything the featurizer prints must not corrupt the pickle stream
    sys.stdout = sys.stderr

    fz = None
    cache_dir = None
    data_cfg = fz_kwargs = None
    while True:
        try:
            msg = _recv(inp)
        except EOFError:
            return
        if msg[0] == "stop":
            return
        if msg[0] == "init":
            _, data_cfg, kwargs = msg
            kwargs = dict(kwargs)
            cache_dir = kwargs.pop("cache_dir", None)
            if cache_dir:
                os.makedirs(cache_dir, exist_ok=True)
            fz_kwargs = kwargs
            fz = SystemFeaturizer(data_cfg, **kwargs)
            _send(out, "ready")
            continue
        if msg[0] == "post":
            _, rid, poses, args = msg
            try:
                from physdock_tpu.infer.ranking import postprocess_poses

                x_gt = args.pop("x_gt")
                _send(out, ("ok", rid, postprocess_poses(poses, x_gt, **args)))
            except Exception:
                _send(out, ("err", rid, traceback.format_exc()))
            continue
        if msg[0] == "load":
            _, rid, system, kw, num_confs, conf_seed, compact = msg
            import time as _time

            _t0 = _time.perf_counter()
            try:
                cpath = None
                if cache_dir:
                    key = _cache_key(
                        data_cfg, fz_kwargs, system, kw, num_confs,
                        conf_seed, compact,
                    )
                    cpath = os.path.join(cache_dir, key + ".pkl")
                    if os.path.exists(cpath):
                        with open(cpath, "rb") as f:
                            feats, meta, confs = pickle.load(f)
                        meta["_worker_time_s"] = round(
                            _time.perf_counter() - _t0, 3
                        )
                        meta["_feat_cache"] = "hit"
                        _send(out, ("ok", rid, (feats, meta, confs)))
                        continue
                feats, meta = fz.load(system, **kw)
                if compact:
                    from physdock_tpu.model.compact import (
                        compact_batch_np,
                        compact_msa_np,
                    )

                    feats = compact_batch_np(feats)
                    bm = meta.pop("batch_msa_feat", None)
                    if bm is not None:
                        meta["batch_msa_feat_c"] = [
                            compact_msa_np(m) for m in bm
                        ]
                confs = None
                mol = meta.get("ref_mol")
                if num_confs and mol is not None:
                    import numpy as np

                    from physdock_tpu.data.embed import generate_conformers

                    confs = generate_conformers(
                        mol,
                        num_confs=num_confs,
                        base_coords=mol.coords,
                        rng=np.random.default_rng(conf_seed),
                    )
                if cpath:
                    tmp = cpath + f".tmp{os.getpid()}"
                    with open(tmp, "wb") as f:
                        pickle.dump((feats, meta, confs), f, protocol=4)
                    os.replace(tmp, cpath)  # atomic: concurrent workers safe
                meta["_worker_time_s"] = round(_time.perf_counter() - _t0, 3)
                _send(out, ("ok", rid, (feats, meta, confs)))
            except Exception:
                _send(out, ("err", rid, traceback.format_exc()))


if __name__ == "__main__":
    _serve()
