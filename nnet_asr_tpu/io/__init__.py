"""Host-side I/O: HTK features, MLF label files, SCP lists, MMF model text."""

from .htk import HtkHeader, read_htk_file, write_htk_file, FeatureReader
from .scp import ScpEntry, parse_scp_entry, read_scp
from .mlf import MlfReader, MlfWriter
from .labels import LabelRepository
from .mmf import read_matrix_ascii, write_matrix_ascii, read_vector_ascii, write_vector_ascii
