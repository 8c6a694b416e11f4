"""Client for the classify service socket (reference src/classifyjob.py).

Submits a job and prints the metadata reply; --ready health-probes the
daemon (used by container readiness checks)."""

from __future__ import annotations

import argparse
import json
import socket
import sys

from .classifyservice import SOCKET_NAME


def submit(job: dict, socket_path=SOCKET_NAME, timeout=600) -> dict:
    conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    conn.settimeout(timeout)
    conn.connect(str(socket_path))
    conn.sendall(json.dumps(job).encode())
    conn.shutdown(socket.SHUT_WR)
    data = b""
    while True:
        chunk = conn.recv(65536)
        if not chunk:
            break
        data += chunk
    conn.close()
    return json.loads(data.decode())


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("file", nargs="?")
    parser.add_argument("--ready", action="store_true")
    parser.add_argument("--socket", default=SOCKET_NAME)
    parser.add_argument("--cache", action="store_true")
    parser.add_argument("--calculate-thumbnails", action="store_true")
    args = parser.parse_args(argv)
    if args.ready:
        try:
            reply = submit({"ready": True}, args.socket, timeout=5)
            return 0 if reply.get("ready") else 1
        except OSError:
            return 1
    if not args.file:
        parser.error("file required unless --ready")
    reply = submit(
        {
            "file": args.file,
            "cache": args.cache,
            "calculate_thumbnails": args.calculate_thumbnails,
        },
        args.socket,
    )
    print(json.dumps(reply, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
