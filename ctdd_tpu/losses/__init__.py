from ctdd_tpu.losses.losses import (  # noqa: F401
    BinEBMAux,
    CTElbo,
    EBMAux,
    CTElboLambda,
    CatRM,
    CatRMNLL,
    CondCTElbo,
    NLL,
    NLLOriginal,
    SDDMElbo,
    ScoreElbo,
    get_loss,
)
