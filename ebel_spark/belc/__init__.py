"""Clean-room BEL 2.1 compiler used inside the Spark parse UDF."""

from .parse import parse_script  # noqa: F401
from .scriptproc import ir_tree, process_file  # noqa: F401
