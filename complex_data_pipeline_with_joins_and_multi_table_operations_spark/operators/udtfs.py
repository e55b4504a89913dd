"""Python UDTFs (Spark 4 user-defined TABLE functions): one input row →
many output rows with a declared schema, callable from SQL via LATERAL.

Compared to explode(split(...)), a UDTF carries arbitrary per-row Python
logic and multi-column output — the escape hatch when the fan-out logic
outgrows column expressions (tokenizer offsets, parser output, sample
packing). It IS the Python slow path: reserve it for logic built-ins
can't express. The chunker below keeps oracle-mirrorable whitespace
semantics so the plumbing itself is hash-verified cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def chunk_tokens(documents: DataFrame, chunk_size: int = 32) -> DataFrame:
    """Context-window chunking for training-sample preparation: each
    document fans out into fixed-size token windows —
    (doc_id, chunk_idx 1-based, chunk_text, n_tokens). The final partial
    window is kept (standard packing discards or pads downstream)."""
    spark = documents.sparkSession
    from pyspark.sql.functions import udtf

    # defined inside the function so cloudpickle ships the class BY VALUE:
    # a module-level class would be pickled by reference and crash workers
    # that don't have this package on their path (driver-contract rule)
    @udtf(returnType="chunk_idx: int, chunk_text: string, n_tokens: int")
    class _ChunkTokens:
        def eval(self, text: str):  # noqa: ANN001
            if text is None:
                return
            toks = text.split()
            for i in range(0, len(toks), chunk_size):
                window = toks[i : i + chunk_size]
                yield i // chunk_size + 1, " ".join(window), len(window)

    spark.udtf.register("chunk_tokens_udtf", _ChunkTokens)
    documents.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM _udtf_docs d, LATERAL chunk_tokens_udtf(d.text) c
        """
    )


__all__ = ["chunk_tokens"]
