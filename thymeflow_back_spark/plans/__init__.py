from .patterns import BGP

__all__ = ["BGP"]
