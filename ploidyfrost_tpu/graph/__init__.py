from .cdbg import CDBGraph, UnitigHandle
