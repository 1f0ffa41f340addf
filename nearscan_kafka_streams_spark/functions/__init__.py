"""Column-expression libraries beyond the reference surface.

The reference's scalar-function surface (SURVEY (S)2.6) is tiny --
JSON access, decimal arithmetic, string equality -- and maps 1:1 to
``pyspark.sql.functions``.  These modules add the large-scale
training-data-pipeline operators the north star asks for:

- ``text``       -- language id, quality scoring, token counting,
                    document fingerprinting
- ``dedup``      -- exact, MinHash+LSH, SimHash, n-gram Jaccard,
                    embedding-cosine near-dup, exact AllPairs
                    set-similarity join, connected-components clustering
- ``similarity`` -- brute-force, LSH-bucketed, IVF, and PQ/ADC
                    (+exact refine) cosine top-k ANN
- ``multimodal`` -- opaque binary columns + typed metadata plumbing
- ``decontam``   -- benchmark decontamination (word n-gram overlap
                    against a broadcast eval set)
- ``bpe``        -- distributed BPE tokenizer training (word-count
                    reduce -> bounded driver merge loop) + broadcast
                    tokenization
- ``quality_model`` -- hashed bag-of-words linear classifier scoring
                    (feature hashing, codegen'd dot product)
- ``checks``     -- declarative data-quality constraints (Deequ-style;
                    one-scan report + FK anti-joins)
- ``sketches``   -- mergeable Datasketches-HLL distinct rollups
- ``profiling``  -- one-pass column profiles, Misra-Gries heavy hitters
- ``clustering`` / ``graph`` -- exact integer-grid K-Means, fixed-point
                    PageRank
- ``lm`` / ``importance`` -- unigram perplexity gate, DSIR reweighting
- ``scan`` / ``skew`` / ``corpus_prep`` -- distributed prefix scan,
                    salting + bucketed joins, sequence packing +
                    repeated-chunk removal + deterministic shuffle

All hot paths are built-in column expressions (JVM-side, whole-stage
codegen); Pandas UDFs appear only where array-heavy math is genuinely
faster through Arrow.
"""
