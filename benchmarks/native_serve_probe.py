"""Native C++ serve front vs Python HTTP front under concurrent load.

The r3 concurrent-load position (benchmarks/batcher_probe.py): the
device-side ceiling is a ~52 ms b=32 dispatch (~600 qps), but the
Python ThreadingHTTPServer + MicroBatcher delivers only ~38 qps on this
1-core host — the N waiting handler threads (HTTP parse, json, wakeup
storms) GIL-thrash the device thread, inflating each batch to ~333 ms.

fastserve.cpp moves accept/parse/tokenize/top-k-format onto a GIL-free
epoll thread; Python keeps only `fs_next_batch → jitted dispatch →
fs_complete_batch`. This probe measures both fronts through real
sockets, same process, same service, interleaved A/B windows.

Load generation is a single-threaded select loop (not a thread pool) so
the client side costs the same handful of syscalls for both legs and
cannot GIL-starve the Python front it is measuring.
"""

from __future__ import annotations

import json
import select
import socket
import time

import jax

from benchmarks.batcher_probe import build_service
from fashionern_aaai2024_tpu.native import serve_frontend as SF
from fashionern_aaai2024_tpu.retrieval.server import serve


def blast(port: int, reqs, conc: int = 64) -> tuple[float, int]:
    """Open `conc` connections, one request each, single select loop.
    Returns (seconds, completed)."""
    payloads = []
    for r, c, k in reqs[:conc]:
        body = json.dumps({"ref_name": r, "caption": c, "k": k}).encode()
        payloads.append(
            b"POST /query HTTP/1.1\r\nHost: x\r\nContent-Type: "
            b"application/json\r\nContent-Length: "
            + str(len(body)).encode() + b"\r\nConnection: close\r\n\r\n"
            + body)
    socks, bufs = [], {}
    t0 = time.perf_counter()
    for p in payloads:
        s = socket.create_connection(("127.0.0.1", port), timeout=30)
        s.setblocking(False)
        try:
            s.sendall(p)  # small request: fits the socket buffer
        except BlockingIOError:
            pass
        socks.append(s)
        bufs[s.fileno()] = b""
    done = 0
    live = {s.fileno(): s for s in socks}
    deadline = time.perf_counter() + 120
    while live and time.perf_counter() < deadline:
        r, _, _ = select.select(list(live.values()), [], [], 1.0)
        for s in r:
            try:
                chunk = s.recv(65536)
            except (BlockingIOError, ConnectionResetError):
                chunk = b""
            if chunk:
                bufs[s.fileno()] += chunk
            else:
                if b'"results"' in bufs[s.fileno()]:
                    done += 1
                del live[s.fileno()]
                s.close()
    dt = time.perf_counter() - t0
    for s in live.values():
        s.close()
    return dt, done


def main():
    print("devices:", jax.devices(), flush=True)
    svc = build_service()
    reqs = [(f"img{i % 128}", f"a red dress with belt {i}", 10)
            for i in range(64)]

    # Python front (ThreadingHTTPServer + MicroBatcher)
    import threading

    httpd = serve(svc, port=0, dynamic_batching=True)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    py_port = httpd.server_address[1]

    # native front (epoll + C++ batcher) — same service/serve fn
    ns = SF.serve_native(svc, port=0)

    blast(py_port, reqs, 8)  # warm both (compile buckets already warm)
    blast(ns.port, reqs, 8)

    for window in range(3):
        dt_py, n_py = blast(py_port, reqs, 64)
        dt_nat, n_nat = blast(ns.port, reqs, 64)
        print(f"--- window {window} ---\n"
              f"python front: {n_py}/{64} in {dt_py*1e3:.0f} ms "
              f"({n_py/dt_py:.1f} qps)\n"
              f"native front: {n_nat}/{64} in {dt_nat*1e3:.0f} ms "
              f"({n_nat/dt_nat:.1f} qps)", flush=True)

    # steady-state b=1 latency through each front
    def serial(port, n=16):
        lat = []
        for r, c, k in reqs[:n]:
            t0 = time.perf_counter()
            dt, done = blast(port, [(r, c, k)], 1)
            assert done == 1
            lat.append(time.perf_counter() - t0)
        lat.sort()
        return lat[len(lat) // 2] * 1e3

    print(f"serial b=1 p50: python {serial(py_port):.1f} ms, "
          f"native {serial(ns.port):.1f} ms", flush=True)

    ns.shutdown()
    httpd.shutdown()


if __name__ == "__main__":
    main()
