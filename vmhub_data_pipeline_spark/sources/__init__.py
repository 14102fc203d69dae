from .http_transport import HttpTransport, http_transport_factory  # noqa: F401
from .rest import (  # noqa: F401
    EndpointConfig,
    FatalHTTPError,
    MockVMHubAPI,
    NoMoreDataError,
    RestIngestor,
    RetryableHTTPError,
    fetch_endpoint_distributed,
)
