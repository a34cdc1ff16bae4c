from cupyimg_tpu.scipy.special._convex_analysis import (  # noqa: F401
    entr,
    kl_div,
    rel_entr,
    huber,
    pseudo_huber,
)
