"""Model layer: CISTA reconstruction nets, DVS emulator, Super-SloMo, V2E2V."""

from .cista import (
    CistaConfig,
    CistaState,
    init_cista_lstc,
    init_cista_tc,
    cista_lstc_step,
    cista_tc_step,
    cista_zero_state,
    cista_sequence,
)
