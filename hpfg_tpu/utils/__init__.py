from hpfg_tpu.utils.logging import get_logger, mk_path  # noqa: F401
from hpfg_tpu.utils.tb import TBWriter  # noqa: F401
