__version__ = "0.1.0"

# API-compatibility target: the reference exposes version() == "1.0.3"
# (src/pypwt.pyx:608-615).
REFERENCE_API_VERSION = "1.0.3"
