from .rest import (  # noqa: F401
    EndpointConfig,
    FatalHTTPError,
    MockVMHubAPI,
    NoMoreDataError,
    RestIngestor,
    fetch_endpoint_distributed,
)
