"""Engine error types (parity: faconne.util/error, src/faconne/util.cljc:1-6)."""


class FaconneError(ValueError):
    """Raised on invalid domain/range/where specifications."""
