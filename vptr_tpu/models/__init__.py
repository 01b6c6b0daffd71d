from vptr_tpu.models.autoencoder import (  # noqa: F401
    ResnetDecoder,
    ResnetEncoder,
    TorchConvTranspose,
    VPTRDec,
    VPTREnc,
    build_autoencoder,
)
from vptr_tpu.models.discriminator import (  # noqa: F401
    PatchDiscriminator,
    build_discriminator,
)
from vptr_tpu.models.transformer import (  # noqa: F401
    VPTRFormerFAR,
    VPTRFormerNAR,
    build_transformer,
)
