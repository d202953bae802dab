"""Warm fresh-process re-run of the Wan span-grid engine corners.

The first r7_cache_layout pass measured engine_int8_tm_span /
engine_int8_hm_span at 0.73-0.83 f/s — far too slow for the ~3 extra
pow2-bucket programs alone, and with the compiling-process degradation
signature BASELINE.md documents (the MAGI 32.5 s case). This re-measures
both corners against the now-warm persistent compile cache; if they beat
engine_int8_tm (2.79 f/s), the "span_grid stays OFF for Wan" conclusion
flips per the >1% rule.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/exp")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from r7_cache_layout import run_engine

run_engine(False, quant=True, span_grid=True)
run_engine(True, quant=True, span_grid=True)
