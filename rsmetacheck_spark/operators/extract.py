"""HTML -> text extraction (the upstream-extraction slot, run_somef.py:5-16
analog — ours is a pure deterministic function of the `html` bytes so the
per-row invariant `byte-identical extracted text per url` holds).

The pure function lives here; the pipeline applies it inside one fused
mapInPandas pass (operators/model_stage.py) so the Arrow transfer is paid
once for extract+langid+perplexity+scrub together.
"""

from __future__ import annotations

import re

_P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)


def html_unescape(s: str) -> str:
    # Exact inverse of synth.html_escape: entities first, ampersand LAST.
    return s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


def extract_text(html: bytes | bytearray | memoryview) -> str:
    """Invert the fixed template: concat of unescaped <p> blocks by '\\n\\n'."""
    s = bytes(html).decode("utf-8", errors="replace")
    return "\n\n".join(html_unescape(p) for p in _P_RE.findall(s))
