#!/usr/bin/env python
"""Example SHM client: drain decoded payload bytes from the RX_SHM ring to
stdout. Counterpart of the reference's examples/receiver.c.

    python examples/shm_receiver.py > received.bin
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mercury_tpu.native import ShmPayloadRing


def main():
    name = os.environ.get("MERCURY_SHM", "/mercury-tpu-comm")
    ring = ShmPayloadRing(name, 131072, create=False)
    try:
        while True:
            chunk = ring.read(8192)
            if chunk:
                sys.stdout.buffer.write(chunk)
                sys.stdout.buffer.flush()
            else:
                time.sleep(0.05)
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
