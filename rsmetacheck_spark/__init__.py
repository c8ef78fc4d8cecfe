"""rsmetacheck_spark — a from-scratch PySpark-native web-text quality-filter
engine with the query/data-processing capabilities of the reference
(Anas-Elhounsri/RsMetaCheck), recast per BASELINE.json north_rule:

    document table -> per-row rule fan-out -> structured verdict records
    -> keep/drop gate -> per-rule aggregate metrics

(reference shape: detect_pitfalls_main.py:313-398), over Common-Crawl-style
web pages with langid + perplexity + Gopher/C4 heuristics + PII scrub.

Nothing here is a port: execution is DataFrame/Catalyst-first; Python is
confined to Arrow-batched pandas UDFs for the model/scrub stages.
"""

__version__ = "0.1.0"
