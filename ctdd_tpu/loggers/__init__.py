from ctdd_tpu.loggers.loggers import (  # noqa: F401
    ConditionalDenoisingNoteSeq,
    denoisingImages,
    get_logger,
    sample_grid_figure,
)
