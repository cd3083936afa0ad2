#!/usr/bin/env python3
"""Op-level device-time attribution of the fused streaming frame step:
capture a jax.profiler trace over a few steady-state frames and print the
top HLO ops by self time, parsed from the xplane protobuf.

Run: PYTHONPATH=.:/root/.axon_site python scripts/trace_ops.py
"""

import glob
import gzip
import os
import sys
from collections import defaultdict

import numpy as np

import bench


def main():
    import jax

    n_frames = 12
    cfg = bench.build_config()
    from clid_slam_tpu.pipeline.streaming import StreamingSlam
    from clid_slam_tpu.pipeline.synthetic import generate_sequence

    seq = generate_sequence(
        n_frames=n_frames + 4, n_azimuth=1024, n_elev=32, noise_std=0.01,
        seed=3,
    )
    w = 2 * np.pi / 20.0
    vel0 = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])
    system = StreamingSlam(cfg, total_frames=n_frames + 8)
    system.seed_pose(seq.poses[0][:3, :3], seq.poses[0][:3, 3], vel0)
    for i in range(n_frames):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
    system.block()

    logdir = "/tmp/jax_trace_ops"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(n_frames, n_frames + 3):
            system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        system.block()

    # find the xplane file
    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not files:
        print("no xplane captured", glob.glob(f"{logdir}/**", recursive=True))
        return
    with open(files[0], "rb") as f:
        data = f.read()
    for name, tot_ms, n in parse_xplane_top(data, top_n=45):
        print(f"   {tot_ms:9.3f} ms  x{n:4d}  {name[:110]}")


# ------------------------- minimal protobuf wire parser (xplane schema) --
# tensorflow's xplane_pb2 is not importable in this env; the wire format
# (verified against a captured trace): XSpace{planes=1}
# XPlane{name=2, lines=3, event_metadata=4} map entry{key=1,value=2}
# XEventMetadata{id=1,name=2} XLine{name=2, events=4}
# XEvent{metadata_id=1, offset_ps=2, duration_ps=3}.


def _fields(buf):
    """Yield (field_no, wire_type, value) from a protobuf message."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v, i = buf[i : i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v, i = buf[i : i + ln], i + ln
        elif wt == 5:
            v, i = buf[i : i + 4], i + 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def _varint(buf, i):
    r = s = 0
    while True:
        b = buf[i]
        r |= (b & 0x7F) << s
        i += 1
        if not b & 0x80:
            return r, i
        s += 7


def parse_xplane_top(data, top_n=45):
    out = []
    for fno, wt, plane in _fields(data):
        if fno != 1:
            continue
        name = b""
        meta = {}
        lines = []
        for f2, _, v2 in _fields(plane):
            if f2 == 2:
                name = v2
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:  # map<int64, XEventMetadata>
                k = mv = None
                for f3, _, v3 in _fields(v2):
                    if f3 == 1:
                        k = v3
                    elif f3 == 2:
                        mv = v3
                if mv is not None:
                    mname = b""
                    mid = k or 0
                    for f4, _, v4 in _fields(mv):
                        if f4 == 1:
                            mid = v4
                        elif f4 == 2:
                            mname = v4
                    meta[mid] = mname.decode(errors="replace")
        pname = name.decode(errors="replace")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        print(f"== plane: {pname}")
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for ln in lines:
            for f3, _, v3 in _fields(ln):
                if f3 != 4:
                    continue
                mid = dur = 0
                for f4, _, v4 in _fields(v3):
                    if f4 == 1:
                        mid = v4
                    elif f4 == 3:
                        dur = v4
                nm = meta.get(mid, f"#{mid}")
                tot[nm] += dur / 1e9
                cnt[nm] += 1
        total = sum(tot.values())
        print(f"   total event time {total:.1f} ms over 3 frames")
        for nm, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]:
            out.append((nm, ms, cnt[nm]))
    return out


if __name__ == "__main__":
    main()
