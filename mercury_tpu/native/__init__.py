"""Native (C++) host runtime bindings: sample rings, sliding capture window,
shared-memory payload IPC. The library auto-builds on first import if the
shared object is missing (g++, no external deps)."""

from mercury_tpu.native.runtime import (  # noqa: F401
    SampleRing, SlidingWindow, ShmPayloadRing, WindowPool, ensure_built,
)
