from tpu_qe.sort.driver import (  # noqa: F401
    BEST_BACKEND,
    BEST_UNIQUE_PAYLOAD_BACKEND,
    sort_u64,
    sort_u64_numpy,
)


def __getattr__(name):
    # lazy: bigsort/dbigsort pull in exchange machinery not needed by the
    # plain sort path
    if name in ("sort_big", "sort_big_incore"):
        from tpu_qe.sort import bigsort
        return getattr(bigsort, name)
    if name == "sort_big_distributed":
        from tpu_qe.sort.dbigsort import sort_big_distributed
        return sort_big_distributed
    raise AttributeError(name)
