from grid_tpu.data.loci import (
    LPA_KIV2_HG38,
    KIV2_REPEAT_STARTS_HG19,
    KIV2_REPEAT_STARTS_HG38,
    find_locus,
    load_vntr_catalog,
)

__all__ = [
    "LPA_KIV2_HG38",
    "KIV2_REPEAT_STARTS_HG19",
    "KIV2_REPEAT_STARTS_HG38",
    "find_locus",
    "load_vntr_catalog",
]
