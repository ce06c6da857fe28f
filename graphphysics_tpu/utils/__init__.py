from graphphysics_tpu.utils.xdmf import XdmfTimeSeriesReader, XdmfTimeSeriesWriter

__all__ = ["XdmfTimeSeriesReader", "XdmfTimeSeriesWriter"]
