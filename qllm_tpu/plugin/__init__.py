from .chat import loop_in_chat_completion, chat_loop

__all__ = ["loop_in_chat_completion", "chat_loop"]
