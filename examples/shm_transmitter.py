#!/usr/bin/env python
"""Example SHM client: pipe stdin (or a file) into the modem's TX_SHM ring.

Counterpart of the reference's examples/transmitter.c. Run the modem with
`python -m mercury_tpu -m TX_SHM -s 6` in another terminal, then:

    echo "hello over HF" | python examples/shm_transmitter.py
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mercury_tpu.native import ShmPayloadRing


def main():
    data = (open(sys.argv[1], "rb").read() if len(sys.argv) > 1
            else sys.stdin.buffer.read())
    name = os.environ.get("MERCURY_SHM", "/mercury-tpu-comm")
    ring = ShmPayloadRing(name, 131072, create=False)
    sent = 0
    while sent < len(data):
        n = ring.write(data[sent:])
        sent += n
        if n == 0:
            time.sleep(0.05)
    print(f"queued {sent} bytes to the modem", file=sys.stderr)


if __name__ == "__main__":
    main()
