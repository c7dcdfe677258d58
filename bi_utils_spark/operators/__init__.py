"""Operator library (SURVEY.md §2) — DataFrame -> DataFrame functions.

Submodules:
- ``relational``   : filters, watermarks, top-1-per-key, unions, HAVING
- ``nested``       : recursive flatten of arrays/structs (the N-ops)
- ``merge``        : join-based MERGE upsert with timestamp semantics
- ``schema_drift`` : schema diff / max-length drift reports
- ``dedup``        : exact + MinHash/SimHash/Jaccard near-dup
- ``similarity``   : cosine top-k, LSH ANN over embedding columns
- ``textstats``    : token counts, language-ID, quality scores
- ``multimodal``   : binary media columns with typed metadata
- ``classifier``   : hashed NB linear text classifier (quality gate)
- ``phash``        : perceptual-hash image near-dup (aHash + LSH)
(plus the LLM-pipeline tier: chunking, ranking, lm, importance,
mixing, filtering, decontam, packing, splits, graph, export, events;
the web-curation tier: weburl, htmltext, robots, ipnet; the r6
warehouse/analytics tier: scd, dq, histogram, fuzzy, cdc,
attribution, abtest, quantile_sketch, pareto, timeseries,
sketches, distinct_sketch, layout, textnorm, sentences, gopher,
snapshot, bitext, maintenance, incremental)
"""
