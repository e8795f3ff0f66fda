from .parser import FaiParser, build_fai, write_fai
from .record import FaiRecord, FaiView
