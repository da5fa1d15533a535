"""gr-mercury: GNU Radio OOT blocks for the mercury-tpu modem.

See gr_mercury/blocks.py. `HAVE_GNURADIO` reports whether the blocks are
real gr.sync_blocks (gnuradio importable) or standalone equivalents."""

from .blocks import (HAVE_GNURADIO, deframer, framer, gi_adder, gi_remover,
                     zero_depadder, zero_padder)

__all__ = ["HAVE_GNURADIO", "zero_padder", "zero_depadder", "gi_adder",
           "gi_remover", "framer", "deframer"]
