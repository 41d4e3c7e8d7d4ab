from vfr_tpu.eval.moment_eval import evaluate, make_scorer  # noqa: F401
from vfr_tpu.eval.corpus import (  # noqa: F401
    build_moment_index,
    corpus_retrieval,
    corpus_evaluate,
    load_index,
    make_retriever,
    make_stream_retriever,
    save_index,
    serve_queries,
)
