from . import protocol, receiver, streamer

__all__ = ["protocol", "receiver", "streamer"]
