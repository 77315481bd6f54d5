"""Traditional→Simplified Chinese conversion (X4's hanziconv slot).

The reference tokenizer runs ``HanziConv.toSimplified`` over every line
before segmentation (rag/nlp/rag_tokenizer.py:103-104,262). hanziconv's
full one-char table ships with that package (derived from the public
Unihan kSimplifiedVariant data) and is NOT vendored in the reference
repo, so this module provides the same *machinery* — single-pass
``str.translate`` over a char→char table — with two table sources:

- :data:`TRADI2SIMP_FIXTURE`: a pinned, curated table of common
  unambiguous traditional→simplified pairs (coverage: frequent chars in
  web/legal/technical text). Partial BY DESIGN — chars outside the table
  pass through unchanged, which is also hanziconv's behaviour for
  untabled chars.
- :func:`load_table`: accepts hanziconv's own ``charmap``-style pair
  string or a two-column TSV, so deployments with the real asset get
  byte parity by dropping the file in — the same pluggable-asset pattern
  as the huqie dictionary (X5).
"""

from __future__ import annotations

# curated common pairs (traditional -> simplified); sources: general
# CJK knowledge of the standard GB simplifications — each pair is a
# well-known unambiguous mapping
_PAIRS = (
    "東东 馬马 鳥鸟 龍龙 車车 門门 風风 飛飞 雲云 電电 "
    "書书 畫画 語语 話话 說说 讀读 寫写 聽听 請请 謝谢 "
    "學学 習习 師师 國国 園园 圖图 團团 員员 圓圆 買买 "
    "賣卖 貝贝 財财 貨货 貴贵 費费 資资 賞赏 質质 購购 "
    "長长 張张 開开 關关 問问 間间 聞闻 簡简 萬万 億亿 "
    "計计 記记 認认 識识 論论 議议 訓训 設设 訪访 評评 "
    "辦办 協协 華华 單单 戰战 勝胜 勞劳 動动 務务 勢势 "
    "愛爱 惡恶 憂忧 慶庆 應应 懷怀 態态 總总 聰聪 腦脑 "
    "頭头 頁页 題题 顏颜 願愿 類类 顯显 風风 飯饭 飲饮 "
    "館馆 養养 餘余 駕驾 驗验 驚惊 體体 髮发 鬥斗 魚鱼 "
    "鮮鲜 點点 黨党 齊齐 齒齿 廠厂 廣广 慮虑 產产 畢毕 "
    "異异 當当 發发 盡尽 監监 盤盘 確确 礎础 禮礼 種种 "
    "稱称 積积 窮穷 競竞 筆笔 節节 範范 築筑 粒粒 紅红 "
    "級级 紙纸 細细 終终 組组 結结 統统 經经 綠绿 網网 "
    "線线 編编 緣缘 縣县 總总 繁繁 續续 職职 聯联 聲声 "
    "與与 興兴 舊旧 藝艺 藥药 蘇苏 蟲虫 術术 衛卫 見见 "
    "規规 視视 覺觉 觀观 角角 訂订 讓让 豐丰 貫贯 轉转 "
    "輕轻 輪轮 輸输 農农 遠远 適适 選选 遺遗 鄉乡 醫医 "
    "釋释 金金 針针 鐵铁 銀银 錢钱 錄录 鏡镜 鐘钟 閱阅 "
    "陽阳 陰阴 際际 隨随 險险 隱隐 雖虽 雙双 難难 雞鸡 "
    "靈灵 靜静 麵面 鹽盐 數数 樣样 標标 樂乐 機机 權权 "
    "橫横 檢检 條条 來来 極极 構构 槍枪 業业 榮荣 樓楼 "
    "歲岁 歷历 歸归 殘残 殺杀 毆殴 氣气 漢汉 滅灭 滿满 "
    "漲涨 潔洁 濟济 濃浓 灣湾 無无 煩烦 熱热 燈灯 爲为 "
    "爭争 爺爷 牆墙 獨独 獲获 現现 環环 電电 療疗 發发 "
    "皚皑 強强 彈弹 彙汇 從从 復复 徵征 後后 衆众 微微 "
    "實实 寬宽 審审 寫写 寶宝 對对 導导 將将 專专 尋寻 "
    "幾几 庫库 廢废 廳厅 異异 彌弥 彎弯 歸归 録录 鏈链 "
    "這这 進进 連连 週周 運运 過过 達达 違违 遲迟 鄰邻 "
    "釘钉 銷销 鎖锁 錯错 鍵键 鋼钢 鋪铺 頻频 順顺 項项 "
    "須须 預预 領领 頂顶 絡络 兩两 並并 處处 爾尔 麗丽 勵励 臨临 "
    "舉举 優优 償偿 儲储 兒儿 內内 剛刚 創创 劃划 則则 區区 場场 "
    "壓压 壞坏 壢坜 夢梦 夾夹 奮奋 婦妇 媽妈 孫孙 寧宁 層层 屬属 "
    "島岛 峽峡 帶带 幫帮 幹干 廟庙 建建 強强 彆别 響响 顧顾 餐餐 "
    # r5 expansion: further well-known unambiguous GB simplifications
    # (Jianhuazi zong biao first-table entries and their common derived
    # forms); every pair double-checked to be the standard mapping
    "亞亚 佈布 體体 併并 倆俩 倉仓 個个 們们 倫伦 偉伟 側侧 偵侦 "
    "傑杰 傘伞 備备 傳传 傷伤 傾倾 僅仅 僑侨 價价 儀仪 億亿 儉俭 "
    "優优 兌兑 黃黄 凍冻 凱凯 別别 刪删 剄刭 劇剧 劉刘 劍剑 劑剂 "
    "勁劲 勇勇 勳勋 匯汇 區区 協协 卹恤 參参 叢丛 吳吴 呂吕 員员 "
    "唄呗 問问 啓启 啞哑 喚唤 喪丧 嗎吗 嘆叹 嘔呕 嘗尝 嘩哗 嘮唠 "
    "嘯啸 嚇吓 嚴严 囑嘱 圍围 園园 圓圆 團团 壇坛 壘垒 壩坝 壹壹 "
    "壺壶 壽寿 夠够 夥伙 夾夹 奧奥 奪夺 奬奖 妝妆 姦奸 娛娱 嫵妩 "
    "嬌娇 嬰婴 孿孪 宮宫 寢寝 實实 寵宠 將将 尷尴 屆届 屍尸 屢屡 "
    "岡冈 嶺岭 嶼屿 巋岿 帥帅 師师 帳帐 幣币 幟帜 幣币 庫库 廁厕 "
    "廂厢 廈厦 廚厨 廠厂 廡庑 廢废 廣广 廩廪 彆别 彈弹 彙汇 徑径 "
    "徹彻 恆恒 惱恼 愴怆 憑凭 憲宪 憶忆 懇恳 懲惩 懶懒 懸悬 戀恋 "
    "戇戆 戲戏 戶户 挾挟 捨舍 捲卷 掃扫 掙挣 掛挂 採采 揀拣 揮挥 "
    "損损 搖摇 搶抢 摯挚 摳抠 撈捞 撐撑 撥拨 撫抚 擁拥 擇择 擊击 "
    "擋挡 擔担 據据 擠挤 擬拟 擴扩 攔拦 攜携 攝摄 攤摊 攬揽 敗败 "
    "敵敌 斃毙 斷断 時时 晝昼 暈晕 暢畅 曆历 曇昙 曉晓 曠旷 曬晒 "
    "東东 棄弃 棗枣 楓枫 榦干 槃盘 樁桩 橋桥 檔档 檜桧 檯台 櫃柜 "
    "櫥橱 欄栏 權权 欽钦 歎叹 歐欧 歟欤 歡欢 歲岁 歷历 殲歼 殼壳 "
    "毀毁 毊毊 氈毡 氫氢 氬氩 氯氯 湯汤 溝沟 滄沧 滬沪 滯滞 滲渗 "
    "滌涤 滷卤 漁渔 漸渐 潛潜 澀涩 澆浇 澤泽 濁浊 濕湿 濫滥 瀆渎 "
    "瀉泻 瀏浏 瀕濒 瀝沥 瀟潇 灑洒 災灾 爐炉 燒烧 燙烫 燦灿 爛烂 "
    "牘牍 犧牺 狀状 狹狭 猶犹 獄狱 獅狮 獎奖 獵猎 獻献 玆兹 珮佩 "
    "瑣琐 瑩莹 璽玺 瓊琼 甌瓯 甕瓮 畝亩 畫画 畵画 疇畴 疊叠 療疗 "
    "癆痨 癢痒 癡痴 發发 皺皱 盜盗 盧卢 眾众 睏困 矚瞩 矯矫 硯砚 "
    "碩硕 碼码 磚砖 礙碍 礦矿 祿禄 禍祸 禎祯 禦御 禪禅 禿秃 秈籼 "
    "稅税 稈秆 稟禀 穌稣 穎颖 穩稳 窩窝 窯窑 窺窥 竅窍 竈灶 竊窃 "
    "籃篮 籌筹 籤签 籟籁 籠笼 籬篱 籲吁 粵粤 糞粪 糧粮 糾纠 紀纪 "
    "約约 純纯 紗纱 納纳 紛纷 紡纺 索索 紫紫 絃弦 絆绊 絕绝 絞绞 "
    "絡络 給给 絮絮 絲丝 綁绑 綜综 綴缀 綫线 維维 綱纲 緊紧 緒绪 "
    "緝缉 緞缎 締缔 緩缓 緬缅 緯纬 練练 縛缚 縫缝 縮缩 縱纵 縷缕 "
    "繃绷 繆缪 繩绳 繪绘 繫系 繳缴 繹绎 繼继 纏缠 纖纤 纜缆 缽钵 "
    "罰罚 罵骂 罷罢 羅罗 羨羡 義义 習习 翹翘 耬耧 聖圣 聘聘 聳耸 "
    "聽听 肅肃 膚肤 膠胶 膽胆 臉脸 臘腊 臟脏 臺台 艙舱 艦舰 艱艰 "
    "莊庄 莖茎 菸烟 萊莱 萵莴 葉叶 著着 蓋盖 蔔卜 蔣蒋 蕩荡 蕭萧 "
    "薦荐 薩萨 藍蓝 藏藏 藹蔼 蘆芦 蘋苹 蘭兰 處处 號号 蝦虾 螞蚂 "
    "螢萤 蟬蝉 蟻蚁 蠅蝇 蠟蜡 蠶蚕 蠻蛮 補补 裝装 裡里 製制 複复 "
    "褲裤 褻亵 襖袄 襪袜 覽览 託托 訊讯 討讨 訟讼 訣诀 許许 訴诉 "
    "診诊 註注 詐诈 詔诏 詞词 詠咏 詢询 試试 詩诗 詳详 誇夸 誌志 "
    "誕诞 誘诱 誠诚 誤误 誦诵 誼谊 調调 諒谅 談谈 諸诸 諺谚 謀谋 "
    "謂谓 謊谎 講讲 謠谣 謹谨 證证 譏讥 譚谭 譜谱 譯译 護护 譽誉 "
    "變变 貌貌 負负 貢贡 販贩 貪贪 責责 貯贮 貳贰 貸贷 貿贸 賀贺 "
    "賃赁 賄贿 賊贼 賓宾 賜赐 賠赔 賦赋 賬账 賭赌 賴赖 賺赚 贈赠 "
    "贊赞 贏赢 趕赶 趙赵 跡迹 踐践 蹌跄 蹤踪 躍跃 軀躯 軌轨 軍军 "
    "軟软 較较 載载 輔辅 輝辉 輩辈 輻辐 輾辗 轄辖 轟轰 辮辫 辯辩 "
    "邁迈 還还 邊边 郵邮 鄭郑 鄧邓 釀酿 釣钓 鈍钝 鈔钞 鈕钮 鈞钧 "
    "鈴铃 鉅巨 鉛铅 鉤钩 鉴鉴 銅铜 銓铨 銜衔 銳锐 鋁铝 鋒锋 鋤锄 "
    "鋭锐 錫锡 錦锦 錶表 鍊炼 鍋锅 鍛锻 鎊镑 鎮镇 鏟铲 鑄铸 鑑鉴 "
    "鑰钥 鑲镶 閃闪 閉闭 閘闸 閣阁 閥阀 閩闽 閲阅 闆板 闊阔 闖闯 "
    "陝陕 陳陈 陸陆 隊队 階阶 隕陨 雜杂 離离 雲云 霧雾 靂雳 靄霭 "
    "靚靓 預预 頑顽 頌颂 頒颁 頗颇 頜颌 頸颈 頹颓 額额 顆颗 顛颠 "
    "顫颤 飄飘 飢饥 飼饲 餃饺 餅饼 餓饿 餵喂 饅馒 饒饶 饑饥 馮冯 "
    "馳驰 駁驳 駐驻 駛驶 騎骑 騙骗 騰腾 驅驱 驕骄 驢驴 骯肮 髒脏 "
    "鬆松 鬍胡 鬧闹 魯鲁 鯉鲤 鳳凤 鳴鸣 鴉鸦 鴨鸭 鴻鸿 鵝鹅 鷹鹰 "
    "鹼碱 麥麦 麼么 黲黪 鼓鼓 鼴鼹 齡龄 龜龟"
)


def _build_fixture() -> dict[int, str]:
    table: dict[int, str] = {}
    for pair in _PAIRS.split():
        if len(pair) != 2:
            continue
        tradi, simp = pair[0], pair[1]
        if tradi != simp:
            table[ord(tradi)] = simp
    return table


TRADI2SIMP_FIXTURE = _build_fixture()


def load_table(path: str) -> dict[int, str]:
    """Load a full conversion table: either hanziconv's charmap module
    format (two aligned strings ``traditional_charmap`` /
    ``simplified_charmap``) or a two-column TSV of (traditional,
    simplified) pairs."""
    text = open(path, encoding="utf-8").read()
    if "traditional_charmap" in text:
        ns: dict = {}
        exec(compile(text, path, "exec"), ns)  # hanziconv charmap module
        tr, si = ns["traditional_charmap"], ns["simplified_charmap"]
        return {ord(a): b for a, b in zip(tr, si) if a != b}
    table: dict[int, str] = {}
    for ln in text.splitlines():
        cols = ln.split("\t")
        if len(cols) >= 2 and len(cols[0]) == 1 and len(cols[1]) >= 1:
            table[ord(cols[0])] = cols[1][0]
    return table


def to_simplified(line: str, table: dict[int, str] | None = None) -> str:
    """``HanziConv.toSimplified`` (rag_tokenizer.py:103-104): per-char
    translate; untabled chars pass through."""
    return line.translate(TRADI2SIMP_FIXTURE if table is None else table)
