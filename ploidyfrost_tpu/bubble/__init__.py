from .superbubble import BubbleState, find_superbubbles
