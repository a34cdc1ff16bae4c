from cupyimg_tpu.skimage.transform._geometric import (  # noqa: F401
    estimate_transform,
    matrix_transform,
    EuclideanTransform,
    SimilarityTransform,
    AffineTransform,
    ProjectiveTransform,
    FundamentalMatrixTransform,
    EssentialMatrixTransform,
    PolynomialTransform,
    PiecewiseAffineTransform,
)
from cupyimg_tpu.skimage.transform._warps import (  # noqa: F401
    warp,
    warp_coords,
    warp_polar,
    resize,
    rescale,
    rotate,
    swirl,
    downscale_local_mean,
)
from cupyimg_tpu.skimage.transform.integral import (  # noqa: F401
    integral_image,
    integrate,
)
from cupyimg_tpu.skimage.transform.pyramids import (  # noqa: F401
    pyramid_reduce,
    pyramid_expand,
    pyramid_gaussian,
    pyramid_laplacian,
)
